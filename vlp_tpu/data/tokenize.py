"""Caption tokenization.

The reference tokenizes ALL captions once, jointly across both pretrain
datasets and splits, so padding length is shared (max_length 40,
pad/truncate; DistilBERT or TinyBERT tokenizer —
reference PretrainDataModule.py:115-149, :210-215). Here tokenization is
likewise offline: a [num_captions, L] int32 id matrix + attention mask
stored next to the manifest; batches just gather rows on the host.

HF tokenizers are used when their vocab files are in the local cache
(zero-egress environments can't fetch them); otherwise a deterministic
hash-vocabulary WordPiece-free tokenizer stands in — fine for from-scratch
text towers since ids are consistent, flagged in logs because it breaks
compatibility with pretrained BERT weights.
"""
from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)

TOKENIZER_HF_NAMES = {
    "distilbert": "distilbert-base-uncased",
    "tinybert": "huawei-noah/TinyBERT_General_4L_312D",
}

CLS_ID, SEP_ID, PAD_ID, UNK_ID = 101, 102, 0, 100
_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


class HashTokenizer:
    """Deterministic fallback: lowercase, split words/punct, stable hash into
    [999, vocab_size). Same id for the same word everywhere."""

    def __init__(self, vocab_size: int = 30522) -> None:
        self.vocab_size = vocab_size

    def _word_id(self, w: str) -> int:
        import hashlib

        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return 999 + (h % (self.vocab_size - 999))

    def __call__(self, texts: Sequence[str], max_length: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        ids = np.full((n, max_length), PAD_ID, np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, t in enumerate(texts):
            words = _WORD_RE.findall(t.lower())[: max_length - 2]
            row = [CLS_ID] + [self._word_id(w) for w in words] + [SEP_ID]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


_TOKENIZER_CACHE: Dict[str, object] = {}


def get_tokenizer(name: str):
    """Returns fn(texts, max_length) -> (ids [N,L] int32, mask [N,L] int32).
    Successful HF loads are cached per name (tokenizer_is_hash_fallback and
    the tokenize path would otherwise re-load the HF tokenizer files every
    call). Failures are NOT cached: a transient load failure must not lock
    the hash fallback in for the process lifetime."""
    if name in _TOKENIZER_CACHE:
        return _TOKENIZER_CACHE[name]
    hf_name = TOKENIZER_HF_NAMES.get(name, name)
    try:
        import os

        # hard offline (some HF paths issue retried HEAD requests even with
        # local_files_only)
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(hf_name, local_files_only=True)

        def hf_tokenize(texts, max_length):
            out = tok(list(texts), padding="max_length", truncation=True,
                      max_length=max_length, return_tensors="np")
            return (out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32))

        logger.info("Using HF tokenizer %s", hf_name)
        _TOKENIZER_CACHE[name] = hf_tokenize
        return hf_tokenize
    except Exception as e:
        logger.warning(
            "HF tokenizer %s unavailable locally (%s); using deterministic "
            "hash tokenizer (incompatible with pretrained BERT weights).",
            hf_name, type(e).__name__)
        return HashTokenizer()


def tokenizer_is_hash_fallback(name: str) -> bool:
    """True when `name` resolves to the hash fallback rather than a real HF
    tokenizer. Pairing hash-vocab token ids with PRETRAINED BERT weights
    produces garbage silently — callers importing pretrained text towers
    must hard-error on this combination."""
    return isinstance(get_tokenizer(name), HashTokenizer)


def tokenize_all_captions(
    samples_by_split: Dict[str, List[dict]],
    tokenizer_name: str,
    max_length: int = 40,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Joint tokenization across every split (shared padding — reference
    PretrainDataModule.py:138-149). Returns per-split (ids, mask) arrays
    aligned with the split's sample order."""
    tokenize = get_tokenizer(tokenizer_name)
    all_texts: List[str] = []
    spans: Dict[str, Tuple[int, int]] = {}
    for split, samples in samples_by_split.items():
        start = len(all_texts)
        all_texts.extend(str(s["caption"]) for s in samples)
        spans[split] = (start, len(all_texts))
    ids, mask = tokenize(all_texts, max_length)
    return {split: (ids[a:b], mask[a:b]) for split, (a, b) in spans.items()}
