"""Class-discrimination pretraining for the small text trunk (VERDICT r4
next #2).

The reference's decisive advantage in its cls recipe is DISCRIMINATIVE
text features at step 0: it freezes a PRETRAINED roberta-base
(/root/reference/models/bdetr.py:73-77), so "chair" and "table" are far
apart in feature space before grounding training begins. No pretrained
weights exist in this offline container, and four rounds of studies show
a random-init trunk cannot become class-discriminative within a
few-thousand-step grounding study (NOTES.md r4 diagnosis: ranking is the
sole residual failure; box regression works).

This script builds the offline proxy: train the --small_text trunk
(lang.small_text_roberta_config) on class-name discrimination over the
ScanNet vocabulary (data/resources/scannet_vocab.json: 485 classes + the
relation vocab as auxiliary sequences) — minutes of CPU — and save the
trunk parameters for `--text_init` in scripts/accuracy_study.py /
scripts/overfit_probe.py.

Objectives (both per-token-mean over real tokens):
  1. class-name CE: mean-pooled trunk output -> Dense(485) -> CE on the
     class id. Makes class-name TOKENS linearly separable.
  2. synthetic-utterance CE: the sr3d template "the <cls> <rel> the
     <anchor>" with the TARGET class as the label — forces the class
     token to stay discriminative in sentence CONTEXT (where grounding
     reads it), not just in isolation.

Usage:
  python scripts/pretrain_text.py --out studies/attrib_r5/text_init.npz
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="studies/attrib_r5/text_init.npz")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max_len", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn
    from flax.traverse_util import flatten_dict

    from butd_detr_tpu.lang import small_text_roberta_config
    from butd_detr_tpu.lang.roberta import RobertaModel
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer

    vocab = json.load(open(osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))),
        "butd_detr_tpu", "data", "resources", "scannet_vocab.json")))
    classes = vocab["classes_485"]
    relations = vocab.get("relations", ["near", "left of", "right of"])
    n_cls = len(classes)
    print(f"{n_cls} classes, {len(relations)} relations")

    tok = SimpleTokenizer(max_len=args.max_len)
    rng_np = np.random.RandomState(args.seed)

    def make_batch(bs):
        labels = rng_np.randint(0, n_cls, bs)
        texts = []
        for i, c in enumerate(labels):
            if rng_np.rand() < 0.5:
                texts.append(classes[c])
            else:
                rel = relations[rng_np.randint(len(relations))]
                anchor = classes[rng_np.randint(n_cls)]
                texts.append(f"the {classes[c]} {rel} the {anchor}")
        enc = tok(texts)
        return (jnp.asarray(enc.ids), jnp.asarray(enc.attention_mask),
                jnp.asarray(labels))

    cfg = small_text_roberta_config()

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, ids, mask, *, train=False):
            h = RobertaModel(cfg, name="trunk")(ids, mask, train=train)
            m = mask[..., None].astype(h.dtype)
            pooled = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            return nn.Dense(n_cls, name="cls")(pooled)

    model = Classifier()
    ids, mask, labels = make_batch(args.batch)
    params = model.init(jax.random.PRNGKey(args.seed), ids, mask)["params"]
    opt = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids, mask, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, ids, mask)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return ce, acc

        (ce, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, ce, acc

    t0 = time.time()
    for it in range(args.steps):
        ids, mask, labels = make_batch(args.batch)
        params, opt_state, ce, acc = step(params, opt_state, ids, mask,
                                          labels)
        if it % 200 == 0 or it == args.steps - 1:
            print(f"step {it} ce {float(ce):.3f} acc {float(acc):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # held-out-template check: pure class names, full sweep
    enc = tok(classes)
    logits = model.apply(
        {"params": params}, jnp.asarray(enc.ids),
        jnp.asarray(enc.attention_mask),
    )
    final_acc = float(
        (logits.argmax(-1) == jnp.arange(n_cls)).mean()
    )
    print(f"final class-name sweep acc {final_acc:.3f}")

    trunk = params["trunk"]
    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(trunk).items()
    }
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **flat)
    print(f"saved {len(flat)} trunk arrays -> {args.out}")


if __name__ == "__main__":
    main()
