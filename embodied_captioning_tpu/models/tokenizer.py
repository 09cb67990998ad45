"""Self-contained byte-level BPE tokenizer.

The reference tokenizes with open_clip's pretrained CLIP BPE (49408 merges,
downloaded vocab) and HF tokenizers (ref: captioner/models/coca/coca_model.py,
test_tokenizer.py). This framework runs in a zero-egress environment, so it
ships its own tokenizer: byte-level BPE with merges trained on a built-in
caption-domain corpus (deterministic — the merge table is committed as
package data and regenerated bit-identically by `train_bpe`).

Layout: PAD=0, BOS=1, EOS=2, UNK=3 (unused — byte fallback is total),
byte tokens 4..259, merge tokens 260..vocab_size-1.

Words are pre-split on whitespace; a word carries a leading-space marker byte
(0x20) like GPT-2's Ġ convention, so detokenization is exact for arbitrary
UTF-8 input.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
UNK_ID = 3
BYTE_OFFSET = 4
CLIP_VOCAB_SIZE = 49408  # full-scale table size (== config.CLIP_VOCAB_SIZE)
NUM_SPECIALS = 4

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
DEFAULT_MERGES_PATH = os.path.join(_DATA_DIR, "bpe_merges.json")


def _word_to_bytes(word: str) -> Tuple[int, ...]:
    return tuple(b + BYTE_OFFSET for b in word.encode("utf-8"))


def train_bpe(corpus: Iterable[str], vocab_size: int = 1024,
              ) -> List[Tuple[int, int]]:
    """Learn BPE merges from a corpus. Deterministic: ties broken by pair id
    (among equal counts the lexicographically smallest (left, right) wins).

    Returns the ordered merge list [(left_id, right_id), ...]; merge i creates
    token id BYTE_OFFSET + 256 + i.

    Incremental implementation (pair counts updated only for words containing
    the merged pair, best pair via a lazy max-heap) so reference-scale tables
    (49,408 ids like CLIP's BPE, ref: open_clip bpe_simple_vocab_16e6) train
    in minutes instead of hours.
    """
    import heapq

    word_counts: Dict[Tuple[int, ...], int] = {}
    for line in corpus:
        for i, raw in enumerate(line.strip().split()):
            word = (" " + raw) if i > 0 else raw
            key = _word_to_bytes(word)
            if key:
                word_counts[key] = word_counts.get(key, 0) + 1

    words: List[List[int]] = [list(w) for w in word_counts]
    counts: List[int] = list(word_counts.values())
    pair_counts: Dict[Tuple[int, int], int] = {}
    pair_words: Dict[Tuple[int, int], set] = {}
    for wi, w in enumerate(words):
        c = counts[wi]
        for a, b in zip(w, w[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: List[Tuple[int, int]] = []
    next_id = BYTE_OFFSET + 256
    while next_id < vocab_size and heap:
        negc, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if -negc != cur:  # stale heap entry
            if cur > 0:
                heapq.heappush(heap, (-cur, pair))
            continue
        if cur < 2:
            break
        a, b = pair
        merges.append(pair)
        touched: Dict[Tuple[int, int], int] = {}
        for wi in list(pair_words.get(pair, ())):
            w = words[wi]
            c = counts[wi]
            # remove this word's contribution to all its pairs
            for pp in zip(w, w[1:]):
                touched[pp] = touched.get(pp, 0)
                pair_counts[pp] -= c
                pair_words[pp].discard(wi)
            # apply the merge within the word
            out: List[int] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            words[wi] = out
            # re-add contributions
            for pp in zip(out, out[1:]):
                touched[pp] = touched.get(pp, 0)
                pair_counts[pp] = pair_counts.get(pp, 0) + c
                pair_words.setdefault(pp, set()).add(wi)
        del pair_counts[pair]
        pair_words.pop(pair, None)
        for pp in touched:
            cc = pair_counts.get(pp, 0)
            if cc > 0:
                heapq.heappush(heap, (-cc, pp))
        next_id += 1
    return merges


class Tokenizer:
    """Byte-level BPE encoder/decoder."""

    def __init__(self, merges: Sequence[Tuple[int, int]],
                 vocab_size: Optional[int] = None):
        self.merges = [tuple(m) for m in merges]
        self.rank = {m: i for i, m in enumerate(self.merges)}
        self.merge_id = {m: BYTE_OFFSET + 256 + i
                         for i, m in enumerate(self.merges)}
        self.vocab_size = vocab_size or (BYTE_OFFSET + 256 + len(self.merges))
        # id -> byte string for decoding
        self._bytes: Dict[int, bytes] = {
            BYTE_OFFSET + b: bytes([b]) for b in range(256)}
        for (a, b), mid in self.merge_id.items():
            self._bytes[mid] = self._bytes[a] + self._bytes[b]

    # -- encoding ---------------------------------------------------------
    def _encode_word(self, word: str) -> List[int]:
        toks = list(_word_to_bytes(word))
        while len(toks) > 1:
            pairs = [(self.rank.get((a, b), 1 << 30), i)
                     for i, (a, b) in enumerate(zip(toks, toks[1:]))]
            best_rank, best_i = min(pairs)
            if best_rank >= (1 << 30):
                break
            pair = (toks[best_i], toks[best_i + 1])
            mid = self.merge_id[pair]
            # merge all occurrences of this pair
            out = []
            i = 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == pair[0]
                        and toks[i + 1] == pair[1]):
                    out.append(mid)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    def encode(self, text: str, bos: bool = True, eos: bool = True
               ) -> List[int]:
        ids: List[int] = [BOS_ID] if bos else []
        for i, raw in enumerate(text.strip().split()):
            word = (" " + raw) if i > 0 else raw
            ids.extend(self._encode_word(word))
        if eos:
            ids.append(EOS_ID)
        return ids

    def encode_batch(self, texts: Sequence[str], max_len: int,
                     bos: bool = True, eos: bool = True) -> np.ndarray:
        """[N, max_len] int32, PAD-padded/truncated (EOS preserved)."""
        out = np.full((len(texts), max_len), PAD_ID, np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t, bos, eos)
            if len(ids) > max_len:
                ids = ids[:max_len - 1] + [EOS_ID] if eos else ids[:max_len]
            out[i, :len(ids)] = ids
        return out

    # -- decoding ---------------------------------------------------------
    def decode(self, ids: Iterable[int]) -> str:
        buf = b""
        for t in ids:
            t = int(t)
            if t in (PAD_ID, BOS_ID):
                continue
            if t == EOS_ID:
                break
            buf += self._bytes.get(t, b"")
        return buf.decode("utf-8", errors="replace")

    def decode_batch(self, ids: np.ndarray) -> List[str]:
        return [self.decode(row) for row in np.asarray(ids)]

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump({"merges": self.merges, "vocab_size": self.vocab_size},
                      fh)

    @staticmethod
    def load(path: str) -> "Tokenizer":
        with open(path) as fh:
            d = json.load(fh)
        return Tokenizer(d["merges"], d["vocab_size"])


# ---------------------------------------------------------------------------
# Built-in corpus: caption-domain text for the default merge table.
# ---------------------------------------------------------------------------

_OBJECTS = ["couch", "sofa", "plant", "potted plant", "bed", "table",
            "dining table", "coffee table", "toilet", "tv", "television",
            "monitor", "screen", "chair", "armchair", "lamp", "shelf",
            "cabinet", "pillow", "blanket", "rug", "curtain", "mirror",
            "window", "door", "wall", "floor", "ceiling"]
_COLORS = ["red", "green", "blue", "white", "black", "brown", "gray", "grey",
           "beige", "yellow", "orange", "purple", "dark", "light", "wooden",
           "leather", "fabric", "metal", "glass", "plastic"]
_ROOMS = ["living room", "bedroom", "bathroom", "kitchen", "dining room",
          "hallway", "office", "apartment", "house", "corner of a room"]
_TEMPLATES = [
    "a {c} {o} in a {r}",
    "a {c} {o} sitting in the {r}",
    "there is a {c} {o} next to the wall",
    "a photo of a {c} {o}",
    "the {o} is {c} and stands in the {r}",
    "a {o} with a {c} {o2} on top of it",
    "a close up of a {c} {o} in a {r}",
    "a {c} {o} near a {c2} {o2}",
    "an image of a {r} with a {c} {o}",
    "the {r} has a {c} {o} and a {c2} {o2}",
]
_EXTRA = [
    "this is a picture of furniture inside a home",
    "the room is bright and full of natural light",
    "a small object placed on the floor near the window",
    "two objects are visible in the corner of the image",
    "the camera looks at the scene from above",
    "a flat screen mounted on the wall above a cabinet",
    "someone left a remote control on the sofa cushion",
    "green leaves of a houseplant in a ceramic pot",
    "a neatly made bed with pillows and a blanket",
    "a bathroom with a white toilet and a sink",
]


def builtin_corpus() -> List[str]:
    lines = list(_EXTRA)
    for i, t in enumerate(_TEMPLATES):
        for j, o in enumerate(_OBJECTS):
            c = _COLORS[(i + j) % len(_COLORS)]
            c2 = _COLORS[(i + 2 * j + 3) % len(_COLORS)]
            o2 = _OBJECTS[(j + 5) % len(_OBJECTS)]
            r = _ROOMS[(i * 3 + j) % len(_ROOMS)]
            lines.append(t.format(c=c, o=o, r=r, c2=c2, o2=o2))
    return lines


_DEFAULT: Optional[Tokenizer] = None
_SIZED: Dict[int, Tokenizer] = {}


def default_tokenizer(vocab_size: int = 1024) -> Tokenizer:
    """The committed default tokenizer, truncated so every emitted id is
    < vocab_size (a model embedding table of that size can never receive an
    out-of-range id — JAX clamps out-of-range gathers silently, which would
    corrupt embeddings with no error). Trains + caches the merge table on
    first use if the package data file is missing."""
    global _DEFAULT
    if vocab_size < BYTE_OFFSET + 256:
        raise ValueError(
            f"vocab_size must be >= {BYTE_OFFSET + 256} (specials + bytes), "
            f"got {vocab_size}")
    if vocab_size in _SIZED:
        return _SIZED[vocab_size]
    if _DEFAULT is None:
        if os.path.exists(DEFAULT_MERGES_PATH):
            _DEFAULT = Tokenizer.load(DEFAULT_MERGES_PATH)
        else:
            # missing package data (broken checkout): train a fallback at
            # the REQUESTED size, but only a full-scale table may become
            # the persisted default — persisting the first caller's small
            # table would silently undertrain every later larger-vocab
            # caller (the committed table is CLIP_VOCAB_SIZE merges)
            merges = train_bpe(builtin_corpus(), vocab_size)
            tok = Tokenizer(merges, vocab_size)
            if vocab_size == CLIP_VOCAB_SIZE:
                tok.save(DEFAULT_MERGES_PATH)
                _DEFAULT = tok
            _SIZED[vocab_size] = tok
            return tok
    tok = _DEFAULT
    n_merges = vocab_size - (BYTE_OFFSET + 256)
    if len(tok.merges) > n_merges or tok.vocab_size != vocab_size:
        tok = Tokenizer(tok.merges[:n_merges], vocab_size)
    _SIZED[vocab_size] = tok
    return tok
