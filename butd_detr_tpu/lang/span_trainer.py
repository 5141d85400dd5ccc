"""Span-predictor training pipeline (the reference's side pipeline).

Rebuild of `src/text_cls.py` (Trainer:19, Joint3DDataset:138, main:409):
train a per-token binary classifier (SpanPredictor = trainable RoBERTa +
projector) with BCE against GT span maps built from target-name character
spans; `--store` dumps `{dataset}_pred_spans.json`, which the main
grounding dataset consumes (joint_det_dataset.py:137-220).

TPU-first: fixed-length tokenization on host, ONE jitted train step
(loss+grads+Adam), eval/store steps jitted too; text-only, so it runs fine
on CPU as well (the reference's own CPU-runnable config)."""

import csv
import json
import os
import os.path as osp
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from butd_detr_tpu.lang.span_predictor import (
    SpanPredictor,
    scores_to_pred_spans,
    span_bce_loss,
)
from butd_detr_tpu.lang.tokenizer import get_tokenizer


class SpanTextDataset:
    """Text-only annotations + per-utterance GT span maps
    (text_cls.py:138-352)."""

    def __init__(self, dataset: str = "sr3d", split: str = "train",
                 data_path: str = "./", store: bool = False,
                 tokenizer=None, max_len: int = 128):
        self.dataset = dataset
        self.split = split
        self.data_path = data_path
        self.store = store
        self.max_len = max_len
        self.tokenizer = tokenizer or get_tokenizer(max_len=max_len)
        self.annos = self.load_annos(dataset)

    # -- annotation loading (text-only variants of the main loaders) -----

    def _scan_ids(self, name: str) -> set:
        ids = set()
        meta = osp.join(self.data_path, "meta_data")
        split = "test" if self.split == "val" else self.split
        files = (
            [f"{name}_train_scans.txt", f"{name}_test_scans.txt"]
            if self.store
            else [f"{name}_{split}_scans.txt"]
        )
        for fn in files:
            with open(osp.join(meta, fn)) as f:
                ids |= set(eval(f.read()))
        return ids

    def _read_csv(self, path):
        with open(path) as f:
            reader = csv.reader(f)
            headers = {h: i for i, h in enumerate(next(reader))}
            for line in reader:
                yield headers, line

    def load_annos(self, dset: str) -> List[Dict]:
        if dset in ("sr3d", "sr3d+"):
            return self._load_referit(dset, "sr3d")
        if dset == "nr3d":
            return self._load_referit("nr3d", "nr3d", natural=True)
        if dset == "scanrefer":
            return self._load_scanrefer()
        raise ValueError(dset)

    def _load_referit(self, dset, scans_name, natural=False):
        scan_ids = self._scan_ids(scans_name)
        annos = []
        for h, line in self._read_csv(
            osp.join(self.data_path, "refer_it_3d", f"{dset}.csv")
        ):
            if line[h["scan_id"]] not in scan_ids:
                continue
            if (
                not self.store
                and str(line[h["mentions_target_class"]]).lower() != "true"
            ):
                continue
            annos.append({
                "utterance": line[h["utterance"]],
                "target": line[h["instance_type"]],
            })
        return self._fix_targets(annos)

    def _load_scanrefer(self):
        base = osp.join(self.data_path, "scanrefer", "ScanRefer_filtered")
        split = "val" if self.split in ("val", "test") else self.split
        with open(f"{base}_{split}.txt") as f:
            scan_ids = {line.strip() for line in f if line.strip()}
        with open(f"{base}_{split}.json") as f:
            reader = json.load(f)
        annos = [
            {
                "utterance": " ".join(a["token"]),
                "target": " ".join(str(a["object_name"]).split("_")),
            }
            for a in reader
            if a["scene_id"] in scan_ids
        ]
        for a in annos:  # text_cls.py:277-281
            if a["target"] not in a["utterance"]:
                last = a["target"].split()[-1]
                if last in a["utterance"]:
                    a["target"] = last
        return self._fix_targets(annos)

    def _fix_targets(self, annos):
        """Keep only utterances containing the target when training;
        assign a fake first-word target when storing (text_cls.py:243-252)."""
        if not self.store:
            return [a for a in annos if a["target"] in a["utterance"]]
        for a in annos:
            if a["target"] not in a["utterance"]:
                a["target"] = a["utterance"].split()[0].strip(",")
        return annos

    # -- samples ---------------------------------------------------------

    def __len__(self):
        return len(self.annos)

    def __getitem__(self, index: int) -> Dict:
        from butd_detr_tpu.data.positive_map import (
            normalize_caption,
            token_positive_map,
        )

        anno = self.annos[index]
        _, pmap = token_positive_map(
            self.tokenizer, anno["utterance"], [anno["target"]],
            max_num_obj=1, max_len=self.max_len,
        )
        utterance = normalize_caption(anno["utterance"]) + " . not mentioned"
        tok = self.tokenizer([utterance], max_len=self.max_len)
        return {
            "text_ids": tok.ids[0],
            "text_mask": tok.attention_mask[0],
            "positive_map": pmap[0],  # (256,)
            "orig_utterance": anno["utterance"],
        }


class SpanTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: object
    opt_state: object


class SpanTrainer:
    """Train/eval/store driver (text_cls.py Trainer:19-135)."""

    def __init__(self, config, max_len: int = 128, lr: float = 1e-4,
                 seed: int = 0):
        self.model = SpanPredictor(config)
        self.max_len = max_len
        # Adam betas (0.0, 0.9) per reference text_cls.py:27-29
        self.optimizer = optax.adam(lr, b1=0.0, b2=0.9)
        self.rng = jax.random.PRNGKey(seed)

        def loss_fn(params, batch, rng):
            logits = self.model.apply(
                {"params": params}, batch["text_ids"], batch["text_mask"],
                train=True, rngs={"dropout": rng},
            )
            return span_bce_loss(
                logits, batch["positive_map"][:, : logits.shape[1]]
            )

        def train_step(state, batch):
            rng = jax.random.fold_in(self.rng, state.step)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, rng
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                SpanTrainState(
                    step=state.step + 1, params=params, opt_state=opt_state
                ),
                loss,
            )

        def score_step(state, batch):
            return self.model.apply(
                {"params": state.params},
                batch["text_ids"], batch["text_mask"], train=False,
            )

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.score_step = jax.jit(score_step)
        self.state = None

    def init(self, sample_batch) -> SpanTrainState:
        params = self.model.init(
            self.rng, sample_batch["text_ids"], sample_batch["text_mask"]
        )["params"]
        self.state = SpanTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
        )
        return self.state

    def train_epoch(self, batches) -> float:
        losses = []
        for batch in batches:
            self.state, loss = self.train_step(self.state, batch)
            losses.append(loss)
        return float(np.mean(jax.device_get(losses))) if losses else 0.0

    def eval_accuracy(self, batches) -> float:
        """Exact all-token match rate (text_cls.py:105-111)."""
        correct = total = 0
        for batch in batches:
            scores = np.asarray(self.score_step(self.state, batch))
            pred = (scores > 0).astype(np.float32)
            want = np.asarray(batch["positive_map"])[:, : scores.shape[1]]
            correct += ((pred == (want > 0)).all(axis=1)).sum()
            total += len(scores)
        return correct / max(total, 1)

    def store_spans(self, batches, utterances: List[str], path: str):
        """--store: dump pred spans JSON (text_cls.py:111-135)."""
        spans = []
        for batch in batches:
            scores = np.asarray(self.score_step(self.state, batch))
            spans.append(scores_to_pred_spans(scores))
        spans = np.concatenate(spans) if spans else np.zeros((0, 256))
        payload = [
            {"utterance": u, "span": s.tolist()}
            for u, s in zip(utterances, spans)
        ]
        with open(path, "w") as f:
            json.dump(payload, f)
        return payload


def batch_iter(dataset: SpanTextDataset, batch_size: int, shuffle: bool,
               seed: int = 0, drop_last: bool = False):
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    nb = (
        len(order) // batch_size
        if drop_last
        else (len(order) + batch_size - 1) // batch_size
    )
    for b in range(nb):
        idx = order[b * batch_size:(b + 1) * batch_size]
        samples = [dataset[int(i)] for i in idx]
        yield {
            k: np.stack([s[k] for s in samples])
            for k in ("text_ids", "text_mask", "positive_map")
        }


def run_span_training(args, config=None) -> SpanTrainer:
    """CLI driver (text_cls.py main:409-451)."""
    from butd_detr_tpu.lang.roberta import roberta_base_config

    datasets = {
        split: SpanTextDataset(
            args.dataset, split, args.data_root, args.store,
            max_len=args.max_len,
        )
        for split in ("train", "val")
    }
    print(len(datasets["train"]), len(datasets["val"]))
    trainer = SpanTrainer(
        config or roberta_base_config(), max_len=args.max_len, lr=args.lr
    )
    trainer.init(next(batch_iter(datasets["train"], args.batch_size, False)))

    os.makedirs(args.checkpoint_path, exist_ok=True)
    best = -1.0
    if not args.eval and not args.store:
        for epoch in range(args.epochs):
            loss = trainer.train_epoch(batch_iter(
                datasets["train"], args.batch_size, True, seed=epoch,
                drop_last=True,
            ))
            acc = trainer.eval_accuracy(
                batch_iter(datasets["val"], args.batch_size, False)
            )
            print(f"epoch {epoch + 1}/{args.epochs} loss {loss:.4f} "
                  f"val_acc {acc:.4f}")
            if acc >= best:
                best = acc
                _save_params(
                    osp.join(args.checkpoint_path, args.checkpoint),
                    trainer.state.params,
                )
    if args.store:
        ds = datasets["train"]
        trainer.store_spans(
            batch_iter(ds, args.batch_size, False),
            [a["utterance"] for a in ds.annos],
            f"{args.dataset}_pred_spans.json",
        )
    elif args.eval:
        acc = trainer.eval_accuracy(
            batch_iter(datasets["val"], args.batch_size, False)
        )
        print(f"val_acc {acc:.4f}")
    return trainer


def _save_params(path: str, params):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
