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
