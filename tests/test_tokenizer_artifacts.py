"""Artifact tokenizer parsers (CLIP BPE merges table, HF WordPiece
vocab.txt) against tiny hand-built fixtures with hand-derived expected ids
(VERDICT round-2 next #3: real-checkpoint porting needs the real
tokenizers; these tests pin the file formats and the algorithms)."""

import gzip

import numpy as np

from embodied_captioning_tpu.models.tokenizer_artifacts import (
    CLIPBPETokenizer, WordPieceTokenizer, bytes_to_unicode,
)


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("!")] == "!"          # printable range maps to itself
    assert ord(m[0x20]) >= 256         # space maps to a high char


def _tiny_clip(merges):
    return CLIPBPETokenizer(merges)


def test_clip_bpe_merge_application():
    """Classic BPE walkthrough: merges (l,o),(lo,w),(e,r</w>) turn 'lower'
    into ['low', 'er</w>'] — ids hand-derived from the vocab layout
    256 bytes + 256 byte+'</w>' + merges + 2 specials."""
    tok = _tiny_clip([("l", "o"), ("lo", "w"), ("e", "r</w>")])
    assert tok.vocab_size == 512 + 3 + 2
    assert tok.bos_id == 515 and tok.eos_id == 516 and tok.pad_id == 0
    ids = tok.encode("lower")
    # "lo"=512, "low"=513, "er</w>"=514
    assert ids == [515, 513, 514, 516]
    assert tok.decode(ids) == "lower"


def test_clip_bpe_unmergeable_falls_to_bytes():
    tok = _tiny_clip([("l", "o")])
    ids = tok.encode("ox", bos=False, eos=False)
    # no applicable merge: 'o' byte token + 'x</w>' end-of-word byte token
    assert ids == [tok.encoder["o"], tok.encoder["x</w>"]]
    assert tok.decode(ids) == "ox"


def test_clip_bpe_text_cleaning_and_splitting():
    tok = _tiny_clip([("l", "o"), ("lo", "w")])
    # lowercasing, whitespace collapse, punctuation split, contraction split
    a = tok.encode("  LOW   low!  ", bos=False, eos=False)
    b = (tok.encode("low", bos=False, eos=False) * 2
         + [tok.encoder["!</w>"]])
    assert a == b
    c = tok.encode("it's", bos=False, eos=False)
    # "'s" is its own lexeme per the CLIP pattern
    assert tok.decode(c) == "it 's"


def test_clip_bpe_gz_artifact_roundtrip(tmp_path):
    """The on-disk format: gzip, version header line, 'a b' merge lines,
    truncated to expected_vocab - 514 merges."""
    lines = ["#version: 0.2", "l o", "lo w", "e r</w>", "x x"]  # 1 extra
    path = tmp_path / "bpe_tiny.txt.gz"
    with gzip.open(path, "wb") as fh:
        fh.write("\n".join(lines).encode("utf-8"))
    tok = CLIPBPETokenizer.load(str(path), expected_vocab=512 + 3 + 2)
    assert tok.vocab_size == 517
    assert tok.encode("lower") == [515, 513, 514, 516]
    # batch padding with pad_id=0 (open_clip zero-padding convention)
    batch = tok.encode_batch(["lower", "low"], 6)
    assert batch.shape == (2, 6)
    assert batch[0, 0] == 515 and (batch[1, -2:] == 0).all()


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able",
         "runn", "##ing", "run", "hello", "world", ",", "!", "a"]


def test_wordpiece_greedy_longest_match():
    tok = WordPieceTokenizer(VOCAB)
    # the canonical BERT example: unaffable -> un ##aff ##able
    ids = tok.encode("unaffable", bos=False, eos=False)
    assert [tok.inv[i] for i in ids] == ["un", "##aff", "##able"]
    ids2 = tok.encode("running", bos=False, eos=False)
    assert [tok.inv[i] for i in ids2] == ["runn", "##ing"]
    assert tok.decode(ids) == "unaffable"


def test_wordpiece_cls_sep_punct_and_unk():
    tok = WordPieceTokenizer(VOCAB)
    ids = tok.encode("Hello, world!")
    toks = [tok.inv[i] for i in ids]
    assert toks == ["[CLS]", "hello", ",", "world", "!", "[SEP]"]
    # out-of-vocab word -> [UNK]; accents stripped by basic tokenization
    assert tok.encode("zzz", bos=False, eos=False) == [tok.unk_id]
    assert tok.encode("Á", bos=False, eos=False) == \
        tok.encode("a", bos=False, eos=False)


def test_wordpiece_vocab_txt_artifact(tmp_path):
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    tok = WordPieceTokenizer.load(str(path))
    assert tok.vocab_size == len(VOCAB)
    assert tok.pad_id == 0 and tok.bos_id == 2 and tok.eos_id == 3
    batch = tok.encode_batch(["hello world", "run"], 8)
    assert batch.shape == (2, 8)
    assert batch[0, 0] == tok.bos_id
    assert (batch[1, 4:] == tok.pad_id).all()
