#!/usr/bin/env python
"""Build the reference-scale BPE merge table (49,408 ids, CLIP-BPE-sized).

The reference tokenizes with open_clip's pretrained 49,408-id CLIP BPE
(ref: captioner/models/coca/coca_model.py; open_clip
bpe_simple_vocab_16e6.txt.gz). This environment has no network egress, so the
table cannot be downloaded; instead we train a byte-BPE of the same size on
text available in the image — the caption-domain builtin corpus (weighted up
so early merges stay caption-English), English prose harvested from the
Python stdlib docstrings, and the Debian common-licenses texts. The resulting
table is committed as package data (`models/data/bpe_merges.json`) exactly
like CLIP ships its merge file; this script regenerates it.

Smaller vocab sizes (e.g. the tiny preset's 1024) are prefix-truncations of
the same table (models/tokenizer.default_tokenizer).
"""

import argparse
import ast
import glob
import json
import os
import sys
import sysconfig
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embodied_captioning_tpu.models.tokenizer import (  # noqa: E402
    BYTE_OFFSET, DEFAULT_MERGES_PATH, Tokenizer, builtin_corpus, train_bpe,
)

VOCAB_SIZE = 49408  # CLIP BPE vocabulary size


def _is_prose(line: str) -> bool:
    """Keep lines that look like English prose, not code."""
    s = line.strip()
    if len(s) < 16:
        return False
    letters = sum(ch.isalpha() for ch in s)
    if letters / len(s) < 0.6:
        return False
    words = s.split()
    return len(words) >= 4 and sum(w.isalpha() for w in words) >= len(words) // 2


def _tree_docstrings(root: str):
    lines = []
    for path in sorted(glob.glob(root + "/**/*.py", recursive=True)):
        try:
            with open(path, encoding="utf-8", errors="ignore") as fh:
                tree = ast.parse(fh.read())
        except (SyntaxError, ValueError, OSError):
            continue
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                                 ast.AsyncFunctionDef)):
                doc = ast.get_docstring(node)
                if doc:
                    lines.extend(l for l in doc.lower().splitlines()
                                 if _is_prose(l))
    return lines


def stdlib_docstrings():
    return _tree_docstrings(sysconfig.get_paths()["stdlib"])


# big English-prose docstring sources baked into the image; enough unique
# vocabulary to fill a CLIP-sized merge table
SITE_PACKAGES = ("numpy", "scipy", "torch", "jax", "transformers", "pandas",
                 "sklearn", "matplotlib")


def site_docstrings():
    import importlib.util

    lines = []
    for name in SITE_PACKAGES:
        spec = importlib.util.find_spec(name)
        if spec is None or not spec.submodule_search_locations:
            continue
        root = list(spec.submodule_search_locations)[0]
        got = _tree_docstrings(root)
        print(f"  {name}: {len(got)} prose lines", flush=True)
        lines.extend(got)
    return lines


def license_texts():
    lines = []
    for path in sorted(glob.glob("/usr/share/common-licenses/*")):
        if not os.path.isfile(path):
            continue
        try:
            with open(path, encoding="utf-8", errors="ignore") as fh:
                lines.extend(l for l in fh.read().lower().splitlines()
                             if _is_prose(l))
        except OSError:
            continue
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab-size", type=int, default=VOCAB_SIZE)
    ap.add_argument("--caption-weight", type=int, default=100,
                    help="repeat factor for the caption-domain corpus so "
                         "early (frequent) merges stay caption-English")
    ap.add_argument("--out", default=DEFAULT_MERGES_PATH)
    args = ap.parse_args()

    t0 = time.time()
    captions = builtin_corpus()
    docs = stdlib_docstrings() + site_docstrings()
    lic = license_texts()
    corpus = captions * args.caption_weight + docs + lic
    print(f"corpus: {len(captions)} caption lines x{args.caption_weight}, "
          f"{len(docs)} docstring lines, {len(lic)} license lines "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    merges = train_bpe(corpus, args.vocab_size)
    print(f"trained {len(merges)} merges "
          f"(vocab {BYTE_OFFSET + 256 + len(merges)}/{args.vocab_size}) "
          f"in {time.time() - t0:.0f}s", flush=True)

    tok = Tokenizer(merges, args.vocab_size)
    # roundtrip sanity
    for s in ["a brown leather couch in a bright living room",
              "the potted plant sits next to the television"]:
        assert tok.decode(tok.encode(s)) == s, s
        print(f"  {len(tok.encode(s))} ids <- {s!r}")
    tok.save(args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
