"""Pretrained initialization for from-scratch training runs.

The reference never trains truly from scratch (models/bdetr.py:60-94):
  * `backbone_net` starts from a GroupFree PointNet++ state dict passed as
    `--pp_checkpoint` (bdetr.py:66-71, loaded `strict=False` and only when
    the point cloud has exactly 3 extra channels — train_dist_mod.py:79-97);
  * `text_encoder` is HF-pretrained frozen `roberta-base` (bdetr.py:73-77);
  * `butd_class_embeddings` is the frozen class-name table generated into
    `data/class_embeddings3d.npy` (bdetr.py:86-92).

`apply_pretrained_init` reproduces all three on our TrainState. Each source
is optional and failure-isolated: a missing file degrades to the random
init with a loud log line (this environment has no network egress, so the
HF hub path only works off a local cache or an explicit weights file).
"""

import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import numpy as np

from butd_detr_tpu.train.torch_convert import flatten, resolve, unflatten


def _to_numpy_state_dict(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file; unwrap common {model|state_dict}
    nesting and the DDP 'module.' prefix; return numpy tensors."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "state_dict", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    sd = _to_numpy_state_dict(obj)
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


# ---------------------------------------------------------------------------
# RoBERTa (reference bdetr.py:73-77)
# ---------------------------------------------------------------------------


def roberta_state_dict(source: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Obtain a roberta-base torch state dict.

    source=None  -> transformers local cache (offline; raises if absent)
    source=dir   -> HF snapshot dir (pytorch_model.bin)
    source=file  -> torch checkpoint (.pth/.bin) or .npz of HF-named arrays
    """
    if source is None:
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        from transformers import RobertaModel as HFRoberta

        return _to_numpy_state_dict(
            HFRoberta.from_pretrained("roberta-base").state_dict()
        )
    if osp.isdir(source):
        for name in ("pytorch_model.bin", "model.pth", "model.npz"):
            cand = osp.join(source, name)
            if osp.exists(cand):
                source = cand
                break
        else:
            raise FileNotFoundError(f"no weights file under {source}")
    if source.endswith(".npz"):
        with np.load(source) as z:
            return {k: z[k] for k in z.files}
    return load_torch_state_dict(source)


def init_text_encoder(
    params: Dict, source: Optional[str], roberta_config=None
) -> Tuple[Dict, bool]:
    """Replace params['text_encoder'] with pretrained roberta weights.
    Returns (new_params, loaded)."""
    import dataclasses

    from butd_detr_tpu.lang.roberta import (
        convert_hf_roberta_state_dict,
        roberta_base_config,
    )

    if "text_encoder" not in params:
        return params, False
    sd = roberta_state_dict(source)
    cfg = roberta_config or roberta_base_config()
    n_layers = sum(
        1 for k in params["text_encoder"] if str(k).startswith("layer_")
    )
    if n_layers != cfg.num_hidden_layers:
        cfg = dataclasses.replace(cfg, num_hidden_layers=n_layers)
    new_text = convert_hf_roberta_state_dict(sd, cfg)
    old = flatten(params["text_encoder"])
    new = flatten(new_text)
    missing = set(old) - set(new)
    if missing:
        raise KeyError(f"converted roberta tree is missing {sorted(missing)[:4]}")
    out = dict(params)
    out["text_encoder"] = unflatten({
        path: np.asarray(new[path], dtype=np.asarray(leaf).dtype).reshape(
            np.asarray(leaf).shape
        )
        if tuple(np.asarray(new[path]).shape) == tuple(np.asarray(leaf).shape)
        else _shape_fail(path, new[path], leaf)
        for path, leaf in old.items()
    })
    return out, True


def _shape_fail(path, got, want):
    raise ValueError(
        f"roberta leaf {'/'.join(path)}: shape {np.asarray(got).shape} "
        f"vs template {np.asarray(want).shape}"
    )


# ---------------------------------------------------------------------------
# GroupFree PointNet++ backbone (reference bdetr.py:66-71)
# ---------------------------------------------------------------------------


def init_pointnet_backbone(
    params: Dict, batch_stats: Dict, path: str
) -> Tuple[Dict, Dict, int, int]:
    """Load a GroupFree PointNet++ state dict into backbone_net params and
    batch_stats with the reference's `strict=False` semantics: leaves whose
    torch key is absent keep their current value. Returns
    (params, batch_stats, n_loaded, n_skipped)."""
    sd = load_torch_state_dict(path)
    # the released file addresses Pointnet2Backbone directly; our resolver
    # expects full-model keys — normalize to the backbone_net. prefix
    sd = {
        (k if k.startswith("backbone_net.") else f"backbone_net.{k}"): v
        for k, v in sd.items()
    }
    loaded = skipped = 0

    def fill(tree):
        nonlocal loaded, skipped
        flat = flatten({"backbone_net": tree["backbone_net"]})
        out = {}
        for path, leaf in flat.items():
            try:
                t = resolve(sd, path)
            except KeyError:
                skipped += 1
                out[path] = leaf
                continue
            want = tuple(np.asarray(leaf).shape)
            if tuple(t.shape) != want:
                skipped += 1
                out[path] = leaf
                continue
            out[path] = t.astype(np.asarray(leaf).dtype)
            loaded += 1
        new = dict(tree)
        new["backbone_net"] = unflatten(out)["backbone_net"]
        return new

    if "backbone_net" not in params:
        return params, batch_stats, 0, 0
    params = fill(params)
    if batch_stats and "backbone_net" in batch_stats:
        batch_stats = fill(batch_stats)
    return params, batch_stats, loaded, skipped


# ---------------------------------------------------------------------------
# class-name embedding table (reference bdetr.py:86-92)
# ---------------------------------------------------------------------------


def init_class_embeddings(params: Dict, path: str) -> Tuple[Dict, bool]:
    if "butd_class_embeddings" not in params:
        return params, False
    table = np.load(path, allow_pickle=True)
    leaf = np.asarray(params["butd_class_embeddings"])
    if tuple(table.shape) != tuple(leaf.shape):
        raise ValueError(
            f"class_embeddings3d shape {table.shape} vs param {leaf.shape}"
        )
    out = dict(params)
    out["butd_class_embeddings"] = table.astype(leaf.dtype)
    return out, True


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def apply_pretrained_init(state, cfg, logger=None, roberta_config=None):
    """Reproduce the reference's from-scratch initialization on a fresh
    TrainState. Returns (state, report) where report maps each source to
    'loaded' / 'skipped (...)'."""

    def log(msg):
        if logger is not None:
            logger.info(msg)

    report: Dict[str, str] = {}
    params = state.params
    batch_stats = state.batch_stats

    # 1. frozen roberta-base trunk
    try:
        params, ok = init_text_encoder(
            params, cfg.roberta_checkpoint, roberta_config
        )
        report["text_encoder"] = "loaded" if ok else "skipped (no module)"
    except Exception as e:  # no cache / no file: keep random init, loudly
        report["text_encoder"] = f"skipped ({type(e).__name__}: {e})"
    log(f"pretrained text_encoder: {report['text_encoder']}")

    # 2. GroupFree PointNet++ backbone — same gate as the reference
    #    (bdetr.py:68: input_feature_dim == 3, i.e. color, no height/mv)
    if cfg.pp_checkpoint and cfg.input_feature_dim == 3:
        try:
            params, batch_stats, n_ok, n_skip = init_pointnet_backbone(
                params, batch_stats, cfg.pp_checkpoint
            )
            report["backbone_net"] = f"loaded {n_ok} leaves, {n_skip} kept"
        except Exception as e:
            report["backbone_net"] = f"skipped ({type(e).__name__}: {e})"
    elif cfg.pp_checkpoint:
        report["backbone_net"] = (
            "skipped (input_feature_dim "
            f"{cfg.input_feature_dim} != 3, reference gate bdetr.py:68)"
        )
    else:
        report["backbone_net"] = "skipped (no pp_checkpoint)"
    log(f"pretrained backbone_net: {report['backbone_net']}")

    # 3. frozen class-name embedding table
    emb_path = cfg.class_embeddings_path or osp.join(
        cfg.data_root, "class_embeddings3d.npy"
    )
    if osp.exists(emb_path):
        try:
            params, ok = init_class_embeddings(params, emb_path)
            report["butd_class_embeddings"] = (
                "loaded" if ok else "skipped (not a butd model)"
            )
        except Exception as e:
            report["butd_class_embeddings"] = (
                f"skipped ({type(e).__name__}: {e})"
            )
    else:
        report["butd_class_embeddings"] = f"skipped (no file {emb_path})"
    log(f"pretrained butd_class_embeddings: {report['butd_class_embeddings']}")

    return state.replace(params=params, batch_stats=batch_stats), report
