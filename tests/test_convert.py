"""Weight-converter parity: tiny torch modules -> JAX params -> forward
agreement (the porting harness SURVEY.md §7 calls for)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from embodied_captioning_tpu.config import VitConfig  # noqa: E402
from embodied_captioning_tpu.models import vit as V  # noqa: E402
from embodied_captioning_tpu.tools.convert_weights import (  # noqa: E402
    convert_bert_encoder, convert_clip_vit, convert_gpt_decoder,
)


def _tiny_torch_vit(width=32, layers=2, heads=2, patch=8, image=32):
    """open_clip-style ViT in torch."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential()
            self.mlp.c_fc = nn.Linear(width, width * 4)
            self.mlp.c_proj = nn.Linear(width * 4, width)

        def forward(self, x):
            h = self.ln_1(x)
            a, _ = self.attn(h, h, h, need_weights=False)
            x = x + a
            h = self.ln_2(x)
            x = x + self.mlp.c_proj(torch.nn.functional.gelu(self.mlp.c_fc(h)))
            return x

    class ViT(nn.Module):
        def __init__(self):
            super().__init__()
            grid = image // patch
            self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
            self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
            self.positional_embedding = nn.Parameter(
                torch.randn(grid * grid + 1, width) * 0.02)
            self.ln_pre = nn.LayerNorm(width)
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList(
                [Block() for _ in range(layers)])
            self.ln_post = nn.LayerNorm(width)

        def forward(self, x):
            x = self.conv1(x)  # [B, w, g, g]
            x = x.flatten(2).transpose(1, 2)
            cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], 1) + self.positional_embedding
            x = self.ln_pre(x)
            for blk in self.transformer.resblocks:
                x = blk(x)
            return self.ln_post(x)

    return ViT()


def test_clip_vit_conversion_forward_parity(rng):
    width, layers, heads, patch, image = 32, 2, 2, 8, 32
    tv = _tiny_torch_vit(width, layers, heads, patch, image).eval()
    state = {"visual." + k: v for k, v in tv.state_dict().items()}
    converted = convert_clip_vit(state)
    # graft into a full vit param tree (pooler/proj unused here)
    cfg = VitConfig(image_size=image, patch_size=patch, width=width,
                    layers=layers, heads=heads, pool_queries=4, pool_heads=2,
                    embed_dim=16)
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    for k, v in converted.items():
        params[k] = jax.tree_util.tree_map(jnp.asarray, v)

    img = rng.random((1, image, image, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    from embodied_captioning_tpu.ops.image import patchify

    tokens = patchify(jnp.asarray(img), patch)
    ours = np.asarray(V.vit_features(params, tokens, cfg))
    # bf16 matmuls vs torch f32: loose but meaningful tolerance
    np.testing.assert_allclose(ours, ref, rtol=0.1, atol=0.05)
    # correlation check is the robust cross-precision signal
    c = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert c > 0.999


def test_clip_vit_conversion_parity_vitL_scale():
    """Full ViT-L/14 dims (width 1024, 16 heads, patch 14, image 224):
    backbone conversion is structurally exact at real-checkpoint scale, so
    porting actual open_clip weights is a pure data operation. Depth is
    trimmed to 4 layers for test runtime — layer mapping is identical per
    layer (ref: captioner/models/coca/coca_model.py ViT-L-14 config)."""
    width, layers, heads, patch, image = 1024, 4, 16, 14, 224
    tv = _tiny_torch_vit(width, layers, heads, patch, image).eval()
    state = {"visual." + k: v for k, v in tv.state_dict().items()}
    converted = convert_clip_vit(state)
    cfg = VitConfig(image_size=image, patch_size=patch, width=width,
                    layers=layers, heads=heads, pool_queries=4, pool_heads=8,
                    embed_dim=768)
    params = V.init_vit(jax.random.PRNGKey(0), cfg)
    for k, v in converted.items():
        params[k] = jax.tree_util.tree_map(jnp.asarray, v)

    rng = np.random.default_rng(1)
    img = rng.random((1, image, image, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    from embodied_captioning_tpu.ops.image import patchify

    ours = np.asarray(V.vit_features(params, patchify(jnp.asarray(img),
                                                      patch), cfg))
    c = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert c > 0.995, c  # bf16 compute vs torch f32
    np.testing.assert_allclose(ours, ref, rtol=0.2, atol=0.15)


def test_attn_pool_conversion_parity():
    """open_clip AttentionalPooler structure (query param, MHA with
    kdim=context_dim, ln_q/ln_k before attention, no output LN) -> exact
    function parity through convert_attn_pool + the CoCa-exact pooler path
    (ref: open_clip transformer.AttentionalPooler, used by CoCa ViT-L)."""
    import torch.nn as nn

    from embodied_captioning_tpu.config import VitConfig
    from embodied_captioning_tpu.models.vit import attentional_pool
    from embodied_captioning_tpu.tools.convert_weights import (
        convert_attn_pool,
    )

    d_model, context, heads, n_q = 64, 96, 8, 16

    class Pooler(nn.Module):
        def __init__(self):
            super().__init__()
            self.query = nn.Parameter(torch.randn(n_q, d_model) * 0.1)
            self.attn = nn.MultiheadAttention(d_model, heads, kdim=context,
                                              vdim=context, batch_first=True)
            self.ln_q = nn.LayerNorm(d_model)
            self.ln_k = nn.LayerNorm(context)

        def forward(self, x):
            x = self.ln_k(x)
            q = self.ln_q(self.query)
            out, _ = self.attn(q[None].expand(x.shape[0], -1, -1), x, x,
                               need_weights=False)
            return out

    torch.manual_seed(0)
    tp = Pooler().eval()
    state = {"attn_pool." + k: v for k, v in tp.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_attn_pool(state, dim=d_model))

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 24, context)).astype(np.float32)
    with torch.no_grad():
        ref = tp(torch.from_numpy(feats)).numpy()
    ours = np.asarray(attentional_pool(params, jnp.asarray(feats), heads))
    c = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, c
    np.testing.assert_allclose(ours, ref, rtol=0.1, atol=0.03)


def test_bert_encoder_conversion_shapes():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=16)
    model = BertModel(cfg)
    params = convert_bert_encoder(model.state_dict())
    assert params["tok_emb"].shape == (100, 32)
    assert len(params["blocks"]) == 2
    assert params["blocks"][0]["attn"]["q"]["w"].shape == (32, 32)
    assert params["blocks"][1]["mlp"]["fc"]["w"].shape == (32, 64)


def _bert_parity(hf_cfg, enc_cfg, batch=2, seqlen=12, tol=2e-4):
    """Convert a torch BertModel -> post-LN encoder; check the full SBERT
    pipeline (encoder -> masked mean-pool -> L2 norm) agrees exactly."""
    from transformers import BertModel

    from embodied_captioning_tpu.models.sbert import encode_tokens

    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_bert_encoder(model.state_dict()))

    rng = np.random.default_rng(0)
    ids = rng.integers(5, hf_cfg.vocab_size, (batch, seqlen)).astype(np.int64)
    ids[0, -3:] = 0  # pads (BERT + our PAD_ID are both 0)
    attn = (ids != 0).astype(np.int64)
    with torch.no_grad():
        hidden = model(torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(attn)
                       ).last_hidden_state.numpy()
    m = attn[..., None].astype(np.float32)
    ref = (hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)
    ref = ref / np.maximum(np.linalg.norm(ref, axis=-1, keepdims=True), 1e-8)

    ours = np.asarray(encode_tokens(params, jnp.asarray(ids.astype(np.int32)),
                                    enc_cfg))
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol)


def test_bert_encoder_exact_parity_tiny():
    from transformers import BertConfig

    from embodied_captioning_tpu.config import SentenceEncoderConfig

    hf = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=16, hidden_act="gelu")
    ours = SentenceEncoderConfig(vocab_size=100, width=32, layers=2, heads=2,
                                 mlp_ratio=2.0, max_len=16, embed_dim=32,
                                 post_ln=True, dtype="float32")
    _bert_parity(hf, ours)


def test_bert_encoder_exact_parity_minilm_scale():
    """Full all-MiniLM-L6-v2 architecture (L6/H384/A12/I1536, vocab 30522):
    the converter is structurally exact at real-checkpoint scale, so porting
    the actual pretrained weights is a pure data operation
    (ref: SBERT use, agents/goal_exploration/goal_exploration.py:57)."""
    from transformers import BertConfig

    from embodied_captioning_tpu.config import SentenceEncoderConfig

    hf = BertConfig(vocab_size=30522, hidden_size=384, num_hidden_layers=6,
                    num_attention_heads=12, intermediate_size=1536,
                    max_position_embeddings=512, hidden_act="gelu")
    ours = SentenceEncoderConfig(vocab_size=30522, width=384, layers=6,
                                 heads=12, mlp_ratio=4.0, max_len=512,
                                 embed_dim=384, post_ln=True, dtype="float32")
    _bert_parity(hf, ours, batch=2, seqlen=16)


def test_gpt_decoder_conversion_shapes():
    width = 32
    tv = _tiny_torch_vit(width=width, layers=2, image=32, patch=8)
    state = {
        "token_embedding.weight": torch.randn(50, width),
        "positional_embedding": torch.randn(16, width),
        "ln_final.weight": torch.ones(width),
        "ln_final.bias": torch.zeros(width),
    }
    for k, v in tv.state_dict().items():
        if k.startswith("transformer."):
            state[k] = v
    out = convert_gpt_decoder(state, dim=width)
    assert out["tok_emb"].shape == (50, width)
    assert len(out["text_blocks"]) == 2
    assert "ln_text" in out


def _tiny_torch_coca(width=32, layers=2, heads=2, patch=8, image=32,
                     vocab=64, ctx=16, queries=5):
    """Structural replica of open_clip CoCa (vision tower with attentional
    pooling in the pool->ln_post->split ordering, unimodal text tower,
    interleaved self/cross multimodal decoder with ln_1_kv, text_projection
    head) — the layout convert_coca consumes
    (ref: captioner/models/coca/coca_model.py:92-205 + open_clip towers)."""
    import torch.nn as nn

    def causal(t):
        return torch.triu(torch.full((t, t), float("-inf")), diagonal=1)

    class Block(nn.Module):
        def __init__(self, cross=False):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            if cross:
                self.ln_1_kv = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential()
            self.mlp.c_fc = nn.Linear(width, width * 4)
            self.mlp.c_proj = nn.Linear(width * 4, width)
            self.cross = cross

        def forward(self, x, kv=None, mask=None):
            h = self.ln_1(x)
            if self.cross:
                k = self.ln_1_kv(kv)
                a, _ = self.attn(h, k, k, need_weights=False)
            else:
                a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
            x = x + a
            h = self.ln_2(x)
            return x + self.mlp.c_proj(
                torch.nn.functional.gelu(self.mlp.c_fc(h)))

    class AttnPool(nn.Module):
        def __init__(self):
            super().__init__()
            self.query = nn.Parameter(torch.randn(queries, width) * 0.2)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_q = nn.LayerNorm(width)
            self.ln_k = nn.LayerNorm(width)

        def forward(self, x):
            q = self.ln_q(self.query)[None].expand(x.shape[0], -1, -1)
            k = self.ln_k(x)
            out, _ = self.attn(q, k, k, need_weights=False)
            return out

    class Coca(nn.Module):
        def __init__(self):
            super().__init__()
            grid = image // patch
            v = nn.Module()
            v.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
            v.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
            v.positional_embedding = nn.Parameter(
                torch.randn(grid * grid + 1, width) * 0.02)
            v.ln_pre = nn.LayerNorm(width)
            v.transformer = nn.Module()
            v.transformer.resblocks = nn.ModuleList(
                [Block() for _ in range(layers)])
            v.ln_post = nn.LayerNorm(width)
            v.attn_pool = AttnPool()
            self.visual = v
            t = nn.Module()
            t.token_embedding = nn.Embedding(vocab, width)
            t.positional_embedding = nn.Parameter(
                torch.randn(ctx, width) * 0.02)
            t.transformer = nn.Module()
            t.transformer.resblocks = nn.ModuleList(
                [Block() for _ in range(layers)])
            t.ln_final = nn.LayerNorm(width)
            t.text_projection = nn.Parameter(torch.randn(width, width) * 0.1)
            self.text = t
            d = nn.Module()
            d.resblocks = nn.ModuleList([Block() for _ in range(layers)])
            d.cross_attn = nn.ModuleList(
                [Block(cross=True) for _ in range(layers)])
            d.ln_final = nn.LayerNorm(width)
            d.text_projection = nn.Parameter(torch.randn(width, vocab) * 0.1)
            self.text_decoder = d
            self.logit_scale = nn.Parameter(torch.tensor(2.0))

        def encode_image(self, x):
            v = self.visual
            x = v.conv1(x).flatten(2).transpose(1, 2)
            cls = v.class_embedding[None, None].expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], 1) + v.positional_embedding
            x = v.ln_pre(x)
            for blk in v.transformer.resblocks:
                x = blk(x, mask=None)
            x = v.attn_pool(x)          # pool BEFORE ln_post (CoCa branch)
            x = v.ln_post(x)
            return x[:, 0], x[:, 1:]    # latent, decoder tokens

        def forward(self, img, toks):
            _, img_tokens = self.encode_image(img)
            t = self.text
            T = toks.shape[1]
            x = t.token_embedding(toks) + t.positional_embedding[:T]
            m = causal(T)
            for blk in t.transformer.resblocks:
                x = blk(x, mask=m)
            x = t.ln_final(x)
            d = self.text_decoder
            for sb, cb in zip(d.resblocks, d.cross_attn):
                x = sb(x, mask=m)
                x = cb(x, kv=img_tokens)
            return d.ln_final(x) @ d.text_projection

    return Coca()


def test_convert_coca_full_model_parity(rng):
    """Turnkey CoCa port: convert_coca(full state dict) -> our captioner
    forward reproduces the torch logits (teacher-forced), with the decoder
    consuming pooled[:, 1:] in open_clip's pool->ln_post->split ordering
    and the interleaved self/cross multimodal tower."""
    from embodied_captioning_tpu.config import (
        CaptionerConfig, TextDecoderConfig, VitConfig,
    )
    from embodied_captioning_tpu.models import captioner as CAP
    from embodied_captioning_tpu.tools.convert_weights import convert_coca

    width, layers, heads, patch, image = 32, 2, 2, 8, 32
    vocab, ctx, queries = 64, 16, 5
    torch.manual_seed(7)  # isolate from torch-RNG use in earlier tests
    tm = _tiny_torch_coca(width, layers, heads, patch, image, vocab, ctx,
                          queries).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_coca(dict(tm.state_dict())))
    cfg = CaptionerConfig(
        vision=VitConfig(image_size=image, patch_size=patch, width=width,
                         layers=layers, heads=heads, pool_queries=queries,
                         pool_heads=heads, embed_dim=width),
        text=TextDecoderConfig(context_length=ctx, vocab_size=vocab,
                               width=width, heads=heads, layers=layers,
                               cross_layers=2 * layers, pad_id=0,
                               bos_id=vocab - 2, eos_id=vocab - 1),
        max_caption_len=8)

    img_u8 = (rng.random((2, image, image, 3)) * 255).astype(np.uint8)
    toks = rng.integers(4, vocab - 2, (2, 8)).astype(np.int64)
    # identical preprocessing on both sides (CLIP normalize, no resize)
    from embodied_captioning_tpu.ops.image import CLIP_MEAN, CLIP_STD

    imf = img_u8.astype(np.float32) / 255.0
    imf = ((imf - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
           ).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(imf.transpose(0, 3, 1, 2)),
                 torch.from_numpy(toks)).numpy()

    logits, _, _ = CAP.forward(params, jnp.asarray(img_u8),
                               jnp.asarray(toks.astype(np.int32)), cfg)
    ours = np.asarray(logits, np.float32)
    c = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, c
    # argmax agreement except where the reference's top-2 are a bf16-level
    # near-tie (random tiny-model logits cluster; real checkpoints don't)
    am_o, am_r = ours.argmax(-1), ref.argmax(-1)
    for idx in np.argwhere(am_o != am_r):
        b, t = idx
        gap = ref[b, t, am_r[b, t]] - ref[b, t, am_o[b, t]]
        assert gap < 0.05 * ref.std(), (idx, gap)

    # KV-cached generation runs with the ported structure + CLIP-style ids
    g, lp, ln = CAP.generate(params, jnp.asarray(img_u8),
                             jax.random.PRNGKey(0), cfg)
    assert int(g[0, 0]) == vocab - 2  # configured BOS
    # cached decode == teacher-forced argmax at every emitted position
    # (a bf16 near-tie may flip one choice, after which the sequences
    # legitimately diverge — tolerate only that)
    full, _, _ = CAP.forward(params, jnp.asarray(img_u8), g, cfg)
    fl = np.asarray(full, np.float32)
    gn = np.asarray(g)
    for b in range(2):
        for t in range(cfg.max_caption_len - 1):
            if gn[b, t + 1] in (cfg.text.pad_id,):
                break
            if gn[b, t + 1] != fl[b, t].argmax():
                gap = fl[b, t].max() - fl[b, t, gn[b, t + 1]]
                assert gap < 0.05 * fl.std(), (b, t, gap)
                break
