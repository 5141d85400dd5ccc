"""Span-predictor pipeline: dataset loading from the fake ScanNet CSVs,
BCE training convergence on a tiny batch, --store JSON output that the
main dataset can consume."""

import json
import os.path as osp

import numpy as np
import pytest

from butd_detr_tpu.data.synthetic import make_fake_scannet
from butd_detr_tpu.lang import (
    SpanTextDataset,
    SpanTrainer,
    batch_iter,
    tiny_roberta_config,
)
from butd_detr_tpu.lang.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_span")
    return make_fake_scannet(str(root), points_per_scan=500)


def test_span_dataset_loads(fake_root):
    ds = SpanTextDataset(
        "sr3d", "train", fake_root, tokenizer=SimpleTokenizer(max_len=32),
        max_len=32,
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["text_ids"].shape == (32,)
    assert s["positive_map"].shape == (256,)
    assert s["positive_map"].sum() == pytest.approx(1.0)
    assert "not mentioned" not in s["orig_utterance"]


def test_span_trainer_overfits_and_stores(fake_root, tmp_path):
    tok = SimpleTokenizer(max_len=32)
    ds = SpanTextDataset("sr3d", "train", fake_root, tokenizer=tok,
                         max_len=32)
    trainer = SpanTrainer(tiny_roberta_config(), max_len=32, lr=3e-3)
    batch = next(batch_iter(ds, 2, False))
    trainer.init(batch)
    losses = []
    for _ in range(30):
        trainer.state, loss = trainer.train_step(trainer.state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5  # BCE drops on a fixed batch

    acc = trainer.eval_accuracy([batch])
    assert 0.0 <= acc <= 1.0

    out = str(tmp_path / "sr3d_pred_spans.json")
    payload = trainer.store_spans(
        [batch], [a["utterance"] for a in ds.annos], out
    )
    assert osp.exists(out)
    with open(out) as f:
        loaded = json.load(f)
    assert len(loaded) == 2
    span = np.asarray(loaded[0]["span"])
    assert span.shape == (256,)
    assert span.sum() == pytest.approx(1.0)
    assert loaded[0]["utterance"] == ds.annos[0]["utterance"]
