"""LD-CPS pseudo-captioner: distill multi-view captions into one per object.

Parity with the reference (ref: experimenting_env/captioner/
pseudocaptioner.py): group captions by (episode_id, object_id) from recorded
`bbs` files (:125-154), banned-word filtering (:96-123), caption frequency
table (:156-177), then a consensus scorer:

  clip / itc   score each candidate caption against the object's crop with
               the captioner's contrastive (CLIP-style) heads and pick the
               argmax (ref :463-509 clip/mobileclip/openclip; :193-308
               blip2_itc Q-former matching — our captioner's image/text
               embedding dot product is the same ITC contract)
  sbert        pick the caption whose sentence embedding is closest to the
               centroid of all views (multi-view consistency argmax — the
               objective the reference's LLM prompt asks for)
  tfidf        tf-idf weighted frequency ranking (ref: scripts/consensus.py)
  llm          in-context LLM consensus (ref :359-461 Llama-3-8B 4-bit with
               a <Caption>-tag prompt). Gated: uses a HF causal LM if local
               weights are available (zero-egress environment), else falls
               back to `sbert`.

Output: {"episode_object": caption} JSON, reference format.
"""

from __future__ import annotations

import json
import os
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# words that indicate a useless caption (ref :96-123 banned-words filter)
BANNED_WORDS = (
    "blurry", "blur", "dark", "black image", "white image",
    "close up of a wall", "unclear", "cannot", "nothing",
)


def filter_banned(captions: Sequence[str],
                  banned: Sequence[str] = BANNED_WORDS) -> List[str]:
    out = []
    for c in captions:
        lc = c.lower()
        if any(b in lc for b in banned):
            continue
        if len(lc.strip()) < 3:
            continue
        out.append(c)
    return out


def group_captions(records: Sequence[Dict]) -> Dict[Tuple[int, int],
                                                    List[str]]:
    """records: iterable of {episode, object_id, caption} (e.g. read from
    the obs store's bbs payloads). Groups by (episode, object)
    (ref :125-154)."""
    groups: Dict[Tuple[int, int], List[str]] = defaultdict(list)
    for r in records:
        groups[(int(r["episode"]), int(r["object_id"]))].append(r["caption"])
    return groups


def caption_frequencies(captions: Sequence[str]) -> Counter:
    """(ref :156-177)"""
    return Counter(c.strip().lower() for c in captions)


def records_from_store(exp_path: str) -> List[Dict]:
    """Collect (episode, object_id, caption) rows from recorded bbs npz."""
    from ..utils.obs_store import SampleLoader

    loader = SampleLoader(exp_path)
    rows: List[Dict] = []
    for ep in loader.episodes:
        for cam in loader.cameras(ep):
            for mod in ("bbs", "bbsgt"):
                if mod not in loader.modalities(ep, cam):
                    continue
                for step in loader.steps(ep, cam, mod):
                    payload = loader.get_sample(ep, cam, mod, step).data
                    caps = payload.get("captions")
                    ids = payload.get("object_ids")
                    valid = payload.get("valid")
                    if caps is None or ids is None:
                        continue
                    for i in range(len(caps)):
                        if valid is not None and not valid[i]:
                            continue
                        rows.append({"episode": ep,
                                     "object_id": int(ids[i]),
                                     "caption": str(caps[i]),
                                     "step": step})
    return rows


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------


class PseudoCaptioner:
    def __init__(self, cfg=None, perceiver=None, sentence_encoder=None,
                 method: str = "sbert"):
        self.cfg = cfg
        self.perceiver = perceiver
        self.sentence_encoder = sentence_encoder
        self.method = method

    # -- method implementations -------------------------------------------
    def _sbert_consensus(self, captions: List[str]) -> str:
        enc = self._get_sentence_encoder()
        emb = enc.encode(captions)
        centroid = emb.mean(0)
        centroid /= max(np.linalg.norm(centroid), 1e-9)
        return captions[int(np.argmax(emb @ centroid))]

    @staticmethod
    def _df_table(all_groups: Dict) -> Tuple[Counter, int]:
        """Document-frequency table over every object's caption set —
        depends only on the groups, so consensus() computes it ONCE (it was
        rebuilt per object, making the tfidf method O(G^2))."""
        docs = [" ".join(v).lower() for v in all_groups.values()]
        df: Counter = Counter()
        for d in docs:
            for w in set(d.split()):
                df[w] += 1
        return df, max(len(docs), 1)

    def _tfidf_consensus(self, captions: List[str], df: Counter,
                         n_docs: int) -> str:
        """tf-idf ranking (ref: scripts/consensus.py:16-114): score each
        caption by the sum of tf-idf weights of its words; idf over all
        objects' caption sets."""
        freqs = caption_frequencies(captions)

        def score(c: str) -> float:
            words = c.lower().split()
            if not words:
                return 0.0
            idf = [np.log(n_docs / (1 + df[w])) + 1.0 for w in words]
            return freqs[c.strip().lower()] * float(np.mean(idf))

        return max(captions, key=score)

    def _clip_consensus(self, captions: List[str], crop: np.ndarray) -> str:
        """CLIP-score argmax using the captioner's contrastive heads
        (ref :463-483)."""
        import jax
        import jax.numpy as jnp

        from ..models.captioner import forward

        p = self._get_perceiver()
        cfg = p.cfg.captioner
        # bucket the caption count to a power of two: forward() compiles per
        # batch shape, and group sizes vary (fixed-shape convention)
        k = len(captions)
        cap = 1
        while cap < k:
            cap *= 2
        padded = list(captions) + [""] * (cap - k)
        tok = p.tokenizer.encode_batch(padded, cfg.text.context_length)
        imgs = jnp.asarray(np.tile(crop[None], (cap, 1, 1, 1)))
        _, img_emb, txt_emb = forward(p.params.captioner, imgs,
                                      jnp.asarray(tok), cfg)
        scores = np.asarray(jnp.sum(img_emb * txt_emb, axis=-1))[:k]
        return captions[int(np.argmax(scores))]

    def _llm_consensus(self, captions: List[str]) -> str:
        """In-context LLM consensus (ref :359-461). Requires local HF
        weights (env ECAP_LLM_PATH); zero-egress fallback: sbert centroid."""
        model_path = os.environ.get("ECAP_LLM_PATH")
        if not model_path or not os.path.exists(model_path):
            return self._sbert_consensus(captions)
        try:
            return _hf_llm_consensus(model_path, captions)
        except Exception:
            return self._sbert_consensus(captions)

    # -- plumbing ----------------------------------------------------------
    def _get_sentence_encoder(self):
        if self.sentence_encoder is None:
            from ..models.sbert import SentenceEncoder

            cfg = self.cfg.sentence_encoder if self.cfg else None
            self.sentence_encoder = SentenceEncoder.create(0, cfg)
        return self.sentence_encoder

    def _get_perceiver(self):
        if self.perceiver is None:
            from ..perception import Perceiver

            self.perceiver = Perceiver(self.cfg)
        return self.perceiver

    def consensus(self, groups: Dict[Tuple[int, int], List[str]],
                  crops: Optional[Dict[Tuple[int, int], np.ndarray]] = None,
                  ) -> Dict[str, str]:
        """Distill each object's caption set to one pseudo-caption."""
        out: Dict[str, str] = {}
        df, n_docs = (self._df_table(groups) if self.method == "tfidf"
                      else (None, 0))
        for key, caps in groups.items():
            caps = filter_banned(caps)
            if not caps:
                continue
            if len(caps) == 1:
                chosen = caps[0]
            elif self.method in ("clip", "itc") and crops and key in crops:
                chosen = self._clip_consensus(caps, crops[key])
            elif self.method == "tfidf":
                chosen = self._tfidf_consensus(caps, df, n_docs)
            elif self.method == "llm":
                chosen = self._llm_consensus(caps)
            else:
                chosen = self._sbert_consensus(caps)
            out[f"{key[0]}_{key[1]}"] = chosen
        return out

    def run(self, exp_path: str, output_json: str) -> Dict[str, str]:
        groups = group_captions(records_from_store(exp_path))
        result = self.consensus(groups)
        os.makedirs(os.path.dirname(os.path.abspath(output_json)),
                    exist_ok=True)
        with open(output_json, "w") as fh:
            json.dump(result, fh, indent=2)
        return result


_HF_LLM_CACHE: Dict[str, Tuple] = {}


def _hf_llm_consensus(model_path: str, captions: List[str]) -> str:
    """Prompted consensus with a local HF causal LM (the reference prompts
    Llama-3-8B-Instruct with <Caption> tags, ref :364-447). The model loads
    ONCE per path — consensus() calls this per object group."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    if model_path not in _HF_LLM_CACHE:
        _HF_LLM_CACHE[model_path] = (
            AutoTokenizer.from_pretrained(model_path),
            AutoModelForCausalLM.from_pretrained(
                model_path, torch_dtype=torch.float32))
    tok, model = _HF_LLM_CACHE[model_path]
    listing = "\n".join(f"<Caption>{c}</Caption>" for c in captions)
    prompt = (
        "You are given multiple captions of the same object seen from "
        "different viewpoints. Reply with the single caption that best "
        "describes the object, between <Caption> tags.\n"
        f"{listing}\n<Caption>")
    inputs = tok(prompt, return_tensors="pt")
    out = model.generate(**inputs, max_new_tokens=32, do_sample=False)
    text = tok.decode(out[0][inputs["input_ids"].shape[1]:],
                      skip_special_tokens=True)
    return text.split("</Caption>")[0].strip() or captions[0]
