#!/usr/bin/env python
"""Generate golden MODEL-FORWARD fixtures by RUNNING the reference's
pure-torch transformer modules (models/encoder_decoder_layers.py,
models/modules.py) on random inputs with random weights, in eval mode
(dropout off, BatchNorm on randomized running stats).

The reference's full model cannot run here (its backbone needs the CUDA
extension), but everything above the backbone is pure torch; this pins our
BiEncoderLayer / BiDecoderLayer / prediction heads / query-selection
modules to the reference's numerics, closing the wiring-parity gap that
loss/eval goldens cannot see.

Usage: python tests/golden/gen_model_golden.py
"""

import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import torch

REF = "/root/reference/models"
OUT = osp.join(osp.dirname(osp.abspath(__file__)), "model_golden.npz")

B, V, L, Q, DBOX = 3, 24, 16, 16, 12
D_MODEL, NUM_CLASS = 288, 256


def load_reference():
    # modules.py imports pointnet2.pointnet2_utils.gather_operation (used
    # only by GeneralSamplingModule); stub it with a pure-torch gather.
    def gather_operation(feats, inds):  # (B, C, N), (B, M) int32
        return torch.gather(
            feats, 2,
            inds.long().unsqueeze(1).expand(-1, feats.shape[1], -1),
        )

    pn2 = types.ModuleType("pointnet2")
    pn2_utils = types.ModuleType("pointnet2.pointnet2_utils")
    pn2_utils.gather_operation = gather_operation
    pn2.pointnet2_utils = pn2_utils
    sys.modules["pointnet2"] = pn2
    sys.modules["pointnet2.pointnet2_utils"] = pn2_utils

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mods = load("ref_modules", osp.join(REF, "modules.py"))
    edl = load("ref_edl", osp.join(REF, "encoder_decoder_layers.py"))
    return mods, edl


def randomize(module, rng):
    """Random weights + random BN running stats (tests eval-BN wiring)."""
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.as_tensor(
                rng.normal(0, 0.5, p.shape).astype(np.float32)))
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.as_tensor(
                    rng.normal(0, 0.5, b.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                b.copy_(torch.as_tensor(
                    rng.uniform(0.5, 2.0, b.shape).astype(np.float32)))


def main():
    mods, edl = load_reference()
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    data = {}

    def put_sd(tag, module):
        for k, v in module.state_dict().items():
            data[f"{tag}.sd.{k}"] = v.detach().numpy()

    vis = rng.randn(B, V, D_MODEL).astype(np.float32)
    pos = rng.randn(B, V, D_MODEL).astype(np.float32)
    text = rng.randn(B, L, D_MODEL).astype(np.float32)
    det = rng.randn(B, DBOX, D_MODEL).astype(np.float32)
    query = rng.randn(B, Q, D_MODEL).astype(np.float32)
    qpos = rng.rand(B, Q, 6).astype(np.float32) * 4
    vmask = np.zeros((B, V), bool)
    vmask[:, V - 4:] = True  # some padded vis tokens
    tmask = np.zeros((B, L), bool)
    tmask[0, L - 6:] = True
    tmask[1, L - 2:] = True
    dmask = np.zeros((B, DBOX), bool)
    dmask[:, DBOX - 3:] = True
    for k, v in [("vis", vis), ("pos", pos), ("text", text), ("det", det),
                 ("query", query), ("qpos", qpos), ("vmask", vmask),
                 ("tmask", tmask), ("dmask", dmask)]:
        data[f"in.{k}"] = v

    t = torch.as_tensor

    # --- BiEncoderLayer (butd) ------------------------------------------
    enc = edl.BiEncoderLayer(
        D_MODEL, dropout=0.1, activation="relu", n_heads=8,
        dim_feedforward=256, self_attend_lang=True, self_attend_vis=True,
        use_butd_enc_attn=True,
    ).eval()
    randomize(enc, rng)
    put_sd("enc", enc)
    with torch.no_grad():
        v_out, t_out = enc(
            t(vis), t(pos), t(vmask), t(text), t(tmask), {},
            detected_feats=t(det), detected_mask=t(dmask),
        )
    data["out.enc.vis"] = v_out.numpy()
    data["out.enc.text"] = t_out.numpy()

    # --- BiDecoderLayer (butd, loc_learned) -----------------------------
    dec = edl.BiDecoderLayer(
        D_MODEL, n_heads=8, dim_feedforward=256, dropout=0.1,
        activation="relu", self_position_embedding="loc_learned", butd=True,
    ).eval()
    randomize(dec, rng)
    put_sd("dec", dec)
    with torch.no_grad():
        q_out = dec(
            t(query), t(vis), t(text), t(qpos),
            None, t(tmask), detected_feats=t(det), detected_mask=t(dmask),
        )
    data["out.dec.query"] = q_out.numpy()

    # --- ClsAgnosticPredictHead -----------------------------------------
    head = mods.ClsAgnosticPredictHead(
        NUM_CLASS, 1, Q, D_MODEL,
        objectness=False, heading=False, compute_sem_scores=True,
    ).eval()
    randomize(head, rng)
    put_sd("head", head)
    base_xyz = (rng.rand(B, Q, 3) * 4).astype(np.float32)
    data["in.base_xyz"] = base_xyz
    ep = {}
    with torch.no_grad():
        center, size = head(
            t(query).transpose(1, 2).contiguous(), t(base_xyz), ep, "last_"
        )
    data["out.head.center"] = center.numpy()
    data["out.head.size"] = size.numpy()
    data["out.head.sem"] = ep["last_sem_cls_scores"].numpy()

    # --- PointsObjClsModule ----------------------------------------------
    pobj = mods.PointsObjClsModule(D_MODEL).eval()
    randomize(pobj, rng)
    put_sd("pobj", pobj)
    with torch.no_grad():
        logits = pobj(t(vis).transpose(1, 2).contiguous())
    data["out.pobj"] = logits.squeeze(1).numpy()  # (B, V)

    # --- PositionEmbeddingLearned(6) -------------------------------------
    pe = mods.PositionEmbeddingLearned(6, D_MODEL).eval()
    randomize(pe, rng)
    put_sd("pe", pe)
    with torch.no_grad():
        out = pe(t(qpos))  # (B, F, Q)
    data["out.pe"] = out.transpose(1, 2).numpy()  # (B, Q, F)

    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} with {len(data)} arrays")


if __name__ == "__main__":
    main()
