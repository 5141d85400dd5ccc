"""Run the REFERENCE model on CPU by stubbing its CUDA extension.

The only native piece of nickgkan/butd_detr is `pointnet2._ext`
(pointnet2/_ext_src/src/bindings.cpp:11-24). This module provides a
pure-torch implementation of that pybind11 surface — the non-differentiable
search ops (FPS / ball query / three_nn) bridge to OUR JAX ops (which are
oracle-tested against the CUDA semantics), and the gather/group/interpolate
ops and their explicit grad entry points are plain torch. With this in
`sys.modules`, the reference's own python wrappers, backbone, model, and
losses all run unmodified on CPU — enabling full-model golden parity and
reference-side trainability experiments without a GPU.

Also provides `load_reference_model()` which imports the reference
`models/bdetr.py` with HuggingFace from_pretrained mocked out (no network):
a random-init RobertaModel of a given config and a deterministic
whitespace tokenizer compatible with `batch_encode_plus`.
"""

import importlib.util
import os
import os.path as osp
import sys
import types

import numpy as np
import torch

REF = "/root/reference"


# --------------------------------------------------------------------------
# pointnet2._ext surface
# --------------------------------------------------------------------------

def _jax_cpu():
    import jax

    if jax.default_backend() != "cpu":
        # safe no-op if already configured; tests set this in conftest
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    return jax


def furthest_point_sampling(xyz, npoint):
    _jax_cpu()
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pointcloud import furthest_point_sample_xla

    out = furthest_point_sample_xla(jnp.asarray(xyz.detach().numpy()), npoint)
    return torch.from_numpy(np.asarray(out)).int()


def ball_query(new_xyz, xyz, radius, nsample):
    _jax_cpu()
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pointcloud import _ball_query_scan

    idx, _ = _ball_query_scan(
        float(radius), int(nsample),
        jnp.asarray(xyz.detach().numpy()),
        jnp.asarray(new_xyz.detach().numpy()),
    )
    return torch.from_numpy(np.asarray(idx)).int()


def three_nn(unknown, known):
    _jax_cpu()
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pointcloud import three_nn as _tnn

    dist, idx = _tnn(
        jnp.asarray(unknown.detach().numpy()),
        jnp.asarray(known.detach().numpy()),
    )
    # _ext returns SQUARED distances; the reference wrapper takes the sqrt
    # (pointnet2/pointnet2_utils.py:139-141), ours returns l2 directly.
    d = torch.from_numpy(np.asarray(dist)).float()
    return d * d, torch.from_numpy(np.asarray(idx)).int()


def gather_points(features, idx):
    # features (B, C, N), idx (B, M) -> (B, C, M)
    B, C, N = features.shape
    ind = idx.long().unsqueeze(1).expand(-1, C, -1)
    return torch.gather(features, 2, ind)


def gather_points_grad(grad_out, idx, N):
    B, C, M = grad_out.shape
    out = grad_out.new_zeros(B, C, N)
    ind = idx.long().unsqueeze(1).expand(-1, C, -1)
    out.scatter_add_(2, ind, grad_out)
    return out


def group_points(features, idx):
    # features (B, C, N), idx (B, m, ns) -> (B, C, m, ns)
    B, C, N = features.shape
    _, m, ns = idx.shape
    ind = idx.reshape(B, 1, m * ns).long().expand(-1, C, -1)
    return torch.gather(features, 2, ind).reshape(B, C, m, ns)


def group_points_grad(grad_out, idx, N):
    B, C, m, ns = grad_out.shape
    out = grad_out.new_zeros(B, C, N)
    ind = idx.reshape(B, 1, m * ns).long().expand(-1, C, -1)
    out.scatter_add_(2, ind, grad_out.reshape(B, C, m * ns))
    return out


def three_interpolate(features, idx, weight):
    # features (B, C, m), idx/weight (B, n, 3) -> (B, C, n)
    B, C, m = features.shape
    n = idx.shape[1]
    ind = idx.reshape(B, 1, n * 3).long().expand(-1, C, -1)
    g = torch.gather(features, 2, ind).reshape(B, C, n, 3)
    return (g * weight.unsqueeze(1)).sum(-1)


def three_interpolate_grad(grad_out, idx, weight, m):
    B, C, n = grad_out.shape
    contrib = grad_out.unsqueeze(-1) * weight.unsqueeze(1)  # (B, C, n, 3)
    out = grad_out.new_zeros(B, C, m)
    ind = idx.reshape(B, 1, n * 3).long().expand(-1, C, -1)
    out.scatter_add_(2, ind, contrib.reshape(B, C, n * 3))
    return out


def install_ext_stub():
    """Put a fake `pointnet2._ext` (and package) into sys.modules."""
    pkg = types.ModuleType("pointnet2")
    ext = types.ModuleType("pointnet2._ext")
    for name in (
        "furthest_point_sampling", "gather_points", "gather_points_grad",
        "ball_query", "group_points", "group_points_grad", "three_nn",
        "three_interpolate", "three_interpolate_grad",
    ):
        setattr(ext, name, globals()[name])
    pkg._ext = ext
    pkg.__path__ = []
    sys.modules["pointnet2"] = pkg
    sys.modules["pointnet2._ext"] = ext
    return ext


# --------------------------------------------------------------------------
# Fake HF tokenizer (deterministic, whitespace, no network)
# --------------------------------------------------------------------------

class FakeBatchEncoding(dict):
    def __init__(self, input_ids, attention_mask):
        super().__init__(input_ids=input_ids, attention_mask=attention_mask)
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def to(self, device):
        return self

    def keys(self):
        return ["input_ids", "attention_mask"]


class FakeTokenizer:
    """Whitespace tokenizer: <s>=0, </s>=2, <pad>=1; word ids hashed into
    [4, vocab). Deterministic — shared by the reference-side harness and
    our pipeline so positive maps line up."""

    def __init__(self, vocab_size=1024):
        self.vocab_size = vocab_size

    def word_id(self, w):
        # hashlib, not hash(): builtin str hashing is salted per process
        # (PYTHONHASHSEED), which would silently change token ids across
        # golden regeneration runs
        import hashlib

        h = int.from_bytes(
            hashlib.md5(w.encode()).digest()[:4], "little"
        )
        return 4 + (h % (self.vocab_size - 4))

    def encode_words(self, text):
        return [self.word_id(w) for w in text.strip().split()]

    def batch_encode_plus(self, texts, padding="longest",
                          return_tensors="pt", **kw):
        seqs = [[0] + self.encode_words(t) + [2] for t in texts]
        L = max(len(s) for s in seqs)
        ids = torch.full((len(seqs), L), 1, dtype=torch.long)
        mask = torch.zeros((len(seqs), L), dtype=torch.long)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = torch.as_tensor(s)
            mask[i, : len(s)] = 1
        return FakeBatchEncoding(ids, mask)

    def __call__(self, texts, **kw):
        return self.batch_encode_plus(texts, **kw)


# --------------------------------------------------------------------------
# Reference model loader
# --------------------------------------------------------------------------

def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_model(roberta_config=None, workdir=None, seed=0,
                         **model_kwargs):
    """Import reference models/bdetr.py with mocks and build BeaUTyDETR.

    roberta_config: dict of HF RobertaConfig overrides (random-init,
    frozen — stands in for the pretrained roberta-base).
    workdir: directory that will contain data/class_embeddings3d.npy
    (created if needed); the reference loads it from a relative path.
    Returns (model, tokenizer, modules_namespace).
    """
    import transformers

    install_ext_stub()
    # flat imports inside the pointnet2 python files
    for p in (osp.join(REF, "pointnet2"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)

    torch.manual_seed(seed)
    cfg_kw = dict(
        vocab_size=1024, hidden_size=96, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=1,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    )
    if roberta_config:
        cfg_kw.update(roberta_config)
    rconf = transformers.RobertaConfig(**cfg_kw)
    tok = FakeTokenizer(vocab_size=cfg_kw["vocab_size"])

    orig_model_fp = transformers.RobertaModel.from_pretrained
    orig_tok_fp = transformers.RobertaTokenizerFast.from_pretrained
    transformers.RobertaModel.from_pretrained = classmethod(
        lambda cls, *a, **k: transformers.RobertaModel(rconf)
    )
    transformers.RobertaTokenizerFast.from_pretrained = classmethod(
        lambda cls, *a, **k: tok
    )

    # class embeddings npy on a relative path
    workdir = workdir or os.getcwd()
    os.makedirs(osp.join(workdir, "data"), exist_ok=True)
    npy = osp.join(workdir, "data", "class_embeddings3d.npy")
    if not osp.exists(npy):
        rng = np.random.RandomState(7)
        np.save(npy, rng.randn(485, 768).astype(np.float32))
    oldcwd = os.getcwd()
    os.chdir(workdir)
    try:
        import importlib

        pn2_utils = _load_module(
            "pointnet2_utils", osp.join(REF, "pointnet2/pointnet2_utils.py"))
        # modules.py imports it package-style (`pointnet2.pointnet2_utils`)
        sys.modules["pointnet2"].pointnet2_utils = pn2_utils
        sys.modules["pointnet2.pointnet2_utils"] = pn2_utils
        _load_module(
            "pytorch_utils", osp.join(REF, "pointnet2/pytorch_utils.py"))
        _load_module(
            "pointnet2_modules",
            osp.join(REF, "pointnet2/pointnet2_modules.py"))
        # models/bdetr.py uses package-relative imports: expose the models
        # dir as a package and import through the normal machinery.
        if "refmodels" not in sys.modules:
            pkg = types.ModuleType("refmodels")
            pkg.__path__ = [osp.join(REF, "models")]
            sys.modules["refmodels"] = pkg
        bdetr = importlib.import_module("refmodels.bdetr")
        mods = importlib.import_module("refmodels.modules")
        edl = importlib.import_module("refmodels.encoder_decoder_layers")
        bb = importlib.import_module("refmodels.backbone_module")

        model = bdetr.BeaUTyDETR(**model_kwargs)
    finally:
        os.chdir(oldcwd)
        transformers.RobertaModel.from_pretrained = orig_model_fp
        transformers.RobertaTokenizerFast.from_pretrained = orig_tok_fp

    ns = types.SimpleNamespace(
        bdetr=bdetr, modules=mods, edl=edl, backbone=bb,
        pointnet2_utils=pn2_utils, roberta_config=rconf,
    )
    return model, tok, ns
