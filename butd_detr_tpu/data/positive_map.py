"""Box->token positive maps for soft-token prediction.

Rebuild of reference `joint_det_dataset.py:853-927`
(`_get_token_positive_map`, `get_positive_map`): find each target
category-name's character span inside the utterance, convert char spans to
token spans with the tokenizer's `char_to_token`, and emit a row-normalized
(num_objects, 256) map.
"""

from typing import List, Sequence, Tuple

import numpy as np

NUM_BINS = 256


def normalize_caption(utterance: str) -> str:
    """Whitespace-normalize + separate commas, as the reference does
    everywhere before tokenizing (joint_det_dataset.py:856,744)."""
    return " ".join(utterance.replace(",", " ,").split())


def find_char_spans(
    utterance: str, cat_names: Sequence[str], max_num_obj: int = 132
) -> np.ndarray:
    """Character [start, end) spans of each category name in the padded
    caption (joint_det_dataset.py:856-884): exact ' name ' match first,
    then prefix match, then substring extended to word boundaries."""
    caption = " " + normalize_caption(utterance) + " "
    spans = np.zeros((max_num_obj, 2))
    for c, cat_name in enumerate(cat_names):
        start = caption.find(f" {cat_name} ")
        if start >= 0:
            length = len(cat_name)
        else:
            start = caption.find(" " + cat_name)
            if start >= 0:
                length = len(caption[start + 1:].split()[0])
            else:
                start = caption.find(cat_name)
                assert start > -1, caption
                orig = start
                while caption[start - 1] != " ":
                    start -= 1
                length = len(cat_name) + orig - start
                while caption[length + start] != " ":
                    length += 1
        spans[c, 0] = start
        spans[c, 1] = start + length
    return spans


def get_positive_map(tokenized, char_spans: np.ndarray,
                     batch_idx: int = 0) -> np.ndarray:
    """(n, 2) char spans -> (n, 256) row-normalized token map using
    char_to_token with the reference's +-1/2/3 fallback probing
    (joint_det_dataset.py:899-927). `tokenized` is a lang.tokenizer
    Tokenized batch; char indices are relative to the *caption* (which is
    offset by 1 vs the padded find-string)."""
    n = len(char_spans)
    positive_map = np.zeros((n, NUM_BINS), np.float32)
    c2t = lambda ci: tokenized.char_to_token(batch_idx, ci)  # noqa: E731
    for j, (beg, end) in enumerate(char_spans):
        beg, end = int(beg), int(end)
        beg_pos = c2t(beg)
        if beg_pos is None:
            beg_pos = c2t(beg + 1)
            if beg_pos is None:
                beg_pos = c2t(beg + 2)
        end_pos = c2t(end - 1)
        if end_pos is None:
            end_pos = c2t(end - 2)
            if end_pos is None:
                end_pos = c2t(end - 3)
        if beg_pos is None or end_pos is None:
            continue
        positive_map[j, beg_pos:min(end_pos + 1, NUM_BINS)] = 1.0
    return positive_map / (positive_map.sum(-1, keepdims=True) + 1e-12)


def token_positive_map(
    tokenizer,
    utterance: str,
    cat_names: Sequence[str],
    max_num_obj: int = 132,
    max_len: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """End-to-end: (max_num_obj, 2) char spans + (max_num_obj, 256) map.

    The find-string is the caption padded with one leading space, so spans
    are shifted by -1 before char_to_token (the reference tokenizes the
    *unpadded* caption but finds spans in the padded one; char_to_token of
    `beg` then hits the space before the word, and its None-fallback probes
    beg+1 — we keep identical behavior by passing the same offsets)."""
    caption = normalize_caption(utterance)
    spans = find_char_spans(utterance, cat_names, max_num_obj)
    tokenized = tokenizer([caption], max_len=max_len)
    pmap = np.zeros((max_num_obj, NUM_BINS), np.float32)
    pmap[: len(cat_names)] = get_positive_map(
        tokenized, spans[: len(cat_names)]
    )
    return spans, pmap
