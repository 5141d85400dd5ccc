#!/usr/bin/env python
"""Generate golden loss fixtures by RUNNING the reference's pure-torch loss
code (models/losses.py) on random inputs. Requires /root/reference (the
upstream checkout); the resulting .npz is committed so the parity test
runs anywhere.

Usage: python tests/golden/gen_loss_golden.py
"""

import importlib.util
import os.path as osp
import sys

import numpy as np
import torch

REF = "/root/reference/models/losses.py"
OUT = osp.join(osp.dirname(osp.abspath(__file__)), "loss_golden.npz")


def load_reference():
    spec = importlib.util.spec_from_file_location("ref_losses", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_losses"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", rank=0, world_size=1,
            init_method="tcp://127.0.0.1:29517",
        )
    ref = load_reference()
    torch.manual_seed(0)
    rng = np.random.RandomState(0)

    B, Q, G, T, L, K, NP = 3, 16, 8, 256, 24, 32, 128
    n_valid = [3, 1, 5]
    num_layers = 2
    prefixes = ["proposal_", "0head_", "last_"]

    ep = {}
    data = {}

    def put(name, arr):
        data[name] = arr.astype(np.float32) if arr.dtype.kind == "f" else arr
        ep[name] = torch.as_tensor(arr)

    put("center_label", rng.rand(B, G, 3).astype(np.float32) * 4)
    put("size_gts", (rng.rand(B, G, 3) * 0.6 + 0.2).astype(np.float32))
    put("sem_cls_label", rng.randint(0, 485, (B, G)).astype(np.int64))
    mask = np.zeros((B, G), np.float32)
    for b, n in enumerate(n_valid):
        mask[b, :n] = 1
    put("box_label_mask", mask)
    pm = np.zeros((B, G, T), np.float32)
    for b in range(B):
        for g in range(n_valid[b]):
            s = rng.randint(1, L - 4)
            pm[b, g, s:s + 2] = 0.5
    put("positive_map", pm)
    pil = np.full((B, NP), -1, np.int64)
    for b in range(B):
        for g in range(n_valid[b]):
            lo = g * (NP // (2 * G))
            pil[b, lo:lo + 8] = g
    put("point_instance_label", pil)
    put("seed_inds", rng.randint(0, NP, (B, K)).astype(np.int64))
    put("seed_xyz", rng.rand(B, K, 3).astype(np.float32) * 4)
    put("seeds_obj_cls_logits", rng.randn(B, 1, K).astype(np.float32))

    att = np.zeros((B, L), np.int64)
    for b in range(B):
        att[b, : rng.randint(8, L)] = 1
    data["text_mask"] = att
    ep["tokenized"] = {"attention_mask": torch.as_tensor(att)}

    put("proj_tokens", rng.randn(B, L, 64).astype(np.float32) * 0.3)
    for p in prefixes:
        put(p + "center", rng.rand(B, Q, 3).astype(np.float32) * 4)
        put(p + "pred_size", (rng.rand(B, Q, 3) * 0.7 + 0.1).astype(np.float32))
        put(p + "sem_cls_scores", rng.randn(B, Q, T).astype(np.float32))
        put(p + "proj_queries", rng.randn(B, Q, 64).astype(np.float32) * 0.3)

    # gradient goldens: loss gradients w.r.t. every prediction tensor
    grad_keys = ["proj_tokens", "seeds_obj_cls_logits"] + [
        p + k for p in prefixes
        for k in ("center", "pred_size", "sem_cls_scores", "proj_queries")
    ]
    for k in grad_keys:
        ep[k] = ep[k].clone().requires_grad_(True)

    matcher = ref.HungarianMatcher(1, 0, 2, True)
    criterion = ref.SetCriterion(
        matcher, losses=["boxes", "labels", "contrastive_align"],
        eos_coef=0.1, temperature=0.07,
    )
    loss, ep = ref.compute_hungarian_loss(
        ep, num_layers, criterion, query_points_obj_topk=4
    )
    loss.backward()

    out = dict(data)
    out["num_decoder_layers"] = np.int64(num_layers)
    for k in grad_keys:
        g = ep[k].grad
        out["grad_" + k] = (
            np.zeros(ep[k].shape, np.float32) if g is None
            else g.detach().numpy()
        )
    for k in ("loss", "loss_ce", "loss_bbox", "loss_giou",
              "loss_constrastive_align", "query_points_generation_loss"):
        out["golden_" + k] = np.float64(float(ep[k]))
    np.savez(OUT, **out)
    print({k: round(float(v), 6) for k, v in out.items()
           if k.startswith("golden_")})
    print("wrote", OUT)


if __name__ == "__main__":
    main()
