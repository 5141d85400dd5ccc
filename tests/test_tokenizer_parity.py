"""HF-tokenizer positive-map parity vs the reference (VERDICT r3 #6).

The byte-exact claim — our host-side tokenization + positive-map pipeline
reproduces the reference's `get_positive_map`
(/root/reference/src/joint_det_dataset.py:899-927) — can only execute
where roberta-base tokenizer files exist. This container has no egress
(HF hub unreachable), so the test auto-skips offline; point
BUTD_ROBERTA_TOKENIZER_DIR at a local tokenizer directory (or populate
the HF cache) and it runs for real.

The oracle is the reference's OWN function, exec'd from its source file
at test time (not vendored), fed a genuine `batch_encode_plus` output —
so every quirk (the +1 padded-string char offsets probed via the
+-1/2/3 fallbacks, end-span landing on a space, row normalization) is
checked against the real thing.
"""

import os

import numpy as np
import pytest

REF_DATASET = "/root/reference/src/joint_det_dataset.py"


def _ref_get_positive_map():
    """The reference's get_positive_map, executed from its source."""
    import torch

    with open(REF_DATASET) as f:
        src = f.read()
    start = src.index("def get_positive_map")
    end = src.index("def rot_x")
    ns = {"torch": torch, "np": np}
    exec(compile(src[start:end], REF_DATASET, "exec"), ns)
    return ns["get_positive_map"]


def _tokenizer_source():
    """Local tokenizer dir/name, or skip when files are unavailable."""
    name = os.environ.get("BUTD_ROBERTA_TOKENIZER_DIR", "roberta-base")
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    try:
        from transformers import RobertaTokenizerFast

        return name, RobertaTokenizerFast.from_pretrained(name)
    except Exception as e:  # no egress / no cache
        pytest.skip(f"roberta-base tokenizer unavailable offline: {e}")


# (utterance, cat_names) covering the reference span-finding branches:
# exact ' name ' hit, multi-word names, prefix match (plural), substring
# extended to word boundaries, commas, repeated mentions
CASES = [
    ("the chair left of the table", ["chair"]),
    ("find the shower curtain next to the bathtub",
     ["shower curtain", "bathtub"]),
    ("the trash can near the desk, not the one by the door",
     ["trash can", "desk", "door"]),
    ("pick the chairs closest to the window", ["chair"]),  # prefix match
    ("a wall-mounted shelf above the couch", ["shelf", "couch"]),
    ("cabinet . bed . chair . couch . table . door . not mentioned",
     ["bed", "table"]),  # detection-prompt style
]


def test_hf_positive_map_parity():
    name, ref_tok = _tokenizer_source()
    ref_fn = _ref_get_positive_map()

    from butd_detr_tpu.data.positive_map import (
        find_char_spans,
        get_positive_map,
        normalize_caption,
    )
    from butd_detr_tpu.lang.tokenizer import HFTokenizer

    ours_tok = HFTokenizer(name=name, max_len=256)
    for utterance, cat_names in CASES:
        n = len(cat_names)
        spans = find_char_spans(utterance, cat_names, max_num_obj=n)
        caption = normalize_caption(utterance)

        tokenized = ours_tok([caption], max_len=256)
        ours = get_positive_map(tokenized, spans)

        ref_enc = ref_tok.batch_encode_plus(
            [caption], padding="longest", return_tensors="pt"
        )
        ref = ref_fn(ref_enc, spans)

        np.testing.assert_array_equal(
            ours.astype(np.float64), ref.astype(np.float64),
            err_msg=f"positive-map mismatch for {utterance!r}",
        )
        assert ours[:n].sum(-1).min() > 0, "empty positive row"


def test_hf_char_to_token_matches_batch_encoding():
    """Our Tokenized.char_to_token wrapper == HF's, char by char."""
    name, ref_tok = _tokenizer_source()

    from butd_detr_tpu.data.positive_map import normalize_caption
    from butd_detr_tpu.lang.tokenizer import HFTokenizer

    ours_tok = HFTokenizer(name=name, max_len=256)
    for utterance, _ in CASES:
        caption = normalize_caption(utterance)
        tokenized = ours_tok([caption], max_len=256)
        ref_enc = ref_tok(caption)
        for ci in range(len(caption)):
            assert tokenized.char_to_token(0, ci) == ref_enc.char_to_token(
                ci
            ), (utterance, ci)
