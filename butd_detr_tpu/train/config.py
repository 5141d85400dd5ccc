"""Training/eval configuration.

Dataclass mirror of the reference's argparse surface
(main_utils.py:31-119, ~45 flags), with a CLI that accepts the same flag
names (unknown flags ignored, like the reference's `parse_known_args`).
"""

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class Config:
    # Model (main_utils.py:35-46)
    num_target: int = 256
    sampling: str = "kps"
    num_encoder_layers: int = 3
    num_decoder_layers: int = 6
    self_position_embedding: str = "loc_learned"
    self_attend: bool = False

    # Loss (main_utils.py:48-52)
    query_points_obj_topk: int = 4
    # soft-token no-object weight (reference hardcodes 0.1 at
    # main_utils.py:246/losses.py:343). Overridable for STUDY arms only:
    # at offline data scales (96 scenes vs the reference's 65k samples)
    # the 255:1 eos supervision ratio dominates the single-positive span
    # signal in BOTH systems (studies/attrib_r5 matched-trajectory
    # probes), so accuracy demonstrations need the prior reduced.
    eos_coef: float = 0.1
    use_contrastive_align: bool = False
    use_soft_token_loss: bool = False
    detect_intermediate: bool = False
    joint_det: bool = False

    # Data (main_utils.py:55-70)
    batch_size: int = 8
    dataset: List[str] = field(default_factory=lambda: ["sr3d"])
    test_dataset: str = "sr3d"
    data_root: str = "./"
    use_height: bool = False
    use_color: bool = False
    use_multiview: bool = False
    butd: bool = False
    butd_gt: bool = False
    butd_cls: bool = False
    augment_det: bool = False
    num_workers: int = 4

    # Training (main_utils.py:73-92)
    start_epoch: int = 1
    max_epoch: int = 400
    optimizer: str = "adamW"
    weight_decay: float = 0.0005
    lr: float = 1e-3
    lr_backbone: float = 1e-4
    text_encoder_lr: float = 1e-5
    lr_scheduler: str = "step"  # step | cosine
    lr_decay_epochs: List[int] = field(default_factory=lambda: [280, 340])
    lr_decay_rate: float = 0.1
    clip_norm: float = 0.1
    bn_momentum: float = 0.1
    # Cross-replica BN (reference main_utils.py SyncBN wrap). Under our
    # pjit step BN stats reduce over the GLOBAL dp-sharded batch axis, so
    # SyncBN semantics are always on (train/step.py module docstring;
    # tests/test_harness.py::test_bn_stats_are_global) — the flag is
    # accepted for CLI parity and logged as inherently satisfied.
    syncbn: bool = False
    warmup_epoch: int = -1
    warmup_multiplier: int = 100

    # IO (main_utils.py:95-101)
    checkpoint_path: Optional[str] = None
    log_dir: str = "log"
    print_freq: int = 10
    save_freq: int = 10
    val_freq: int = 5

    # Others (main_utils.py:104-115)
    ap_iou_thresholds: List[float] = field(default_factory=lambda: [0.25, 0.5])
    rng_seed: int = 0
    debug: bool = False
    eval: bool = False
    eval_train: bool = False
    pp_checkpoint: Optional[str] = None
    reduce_lr: bool = False

    # Pretrained-init sources (reference hardcodes these: bdetr.py:73-92)
    roberta_checkpoint: Optional[str] = None  # None = HF local cache
    class_embeddings_path: Optional[str] = None  # None = data_root/class_embeddings3d.npy

    # ---- TPU-framework additions (no reference equivalent)
    # Fixed token length (host-side tokenization). The reference tokenizes
    # unbounded in-forward (bdetr.py:164-167); joint_det random prompts mix
    # up to 20 multi-word class names and can exceed 64 RoBERTa tokens, so
    # joint_det configs are bumped to 128 in __post_init__ (a positive-map
    # span past this length would silently vanish from the contrastive
    # loss; the dataset also fails loudly on any overflow).
    max_text_len: int = 64
    num_points: int = 50000
    max_num_obj: int = 132  # MAX_NUM_OBJ (joint_det_dataset.py:33)
    max_det_boxes: int = 132
    dp: Optional[int] = None  # data-parallel mesh size (None = all devices)
    mp: int = 1
    # jax.profiler tracing: capture `profile_steps` steady-state train
    # steps into profile_dir (TensorBoard-viewable), once per run
    profile_dir: Optional[str] = None
    profile_steps: int = 5
    use_bf16: bool = False
    # bf16 compute for the PointNet++ MLP stacks only (geometry, ball
    # query/FPS, BN statistics and everything downstream stay f32); the
    # backbone is HBM-bandwidth-bound and this halves its intermediate
    # traffic (+7% step throughput measured, PERF.md). Default ON — the
    # TPU-idiomatic dtype; a 1501-step same-seed control run shows
    # trajectory parity with f32 (PERF.md r2 study). Disable with
    # --no-backbone_bf16 for strict f32 reference parity. Independent of
    # use_bf16 (which covers the transformer stack too).
    backbone_bf16: bool = True
    # f32/HIGHEST matmuls inside the fused attention kernels (strict
    # reference parity; ~20% step cost, PERF.md r3). Default off = bf16
    # inputs with f32 accumulation/softmax — no worse than the TF32
    # matmuls the reference trained with on A100. Threaded through the
    # model so changing it recompiles (unlike the BUTD_ATTN_PRECISE env
    # var, which is read once at trace time).
    attn_precise: bool = False
    freeze_text_encoder: bool = True
    # The data pipeline stores each scan's subsampled cloud in Hilbert
    # (spatially local) order (data/scan.py) and the model's sa1 ball
    # query skips its two on-device prep sorts (ops/pointcloud.py
    # presorted=True). A point set is order-free, so semantics are
    # unchanged; results stay exact even if the data is NOT sorted (the
    # pruning guard then falls back to the full sweep — just slower).
    # --no-spatial_sort keeps the reference's random subsample order.
    spatial_sort: bool = True

    def __post_init__(self):
        if self.joint_det and self.max_text_len < 128:
            self.max_text_len = 128

    @property
    def input_feature_dim(self) -> int:
        """Extra per-point channels beyond xyz (joint_det_dataset logic)."""
        d = 0
        if self.use_color:
            d += 3
        if self.use_height:
            d += 1
        if self.use_multiview:
            d += 128
        return d

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def parse_config(argv: Optional[List[str]] = None) -> Config:
    """Parse CLI flags with the reference's names; unknown flags ignored."""
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        alt = "--" + f.name.replace("_", "-")
        names = [name] if name == alt else [name, alt]
        if f.type in (bool, "bool"):
            # BooleanOptionalAction keeps the reference's positive flag
            # names (--butd, --use_color, ...) and adds --no-<flag>, so
            # True-by-default options (e.g. backbone_bf16) can be turned
            # off from the CLI
            parser.add_argument(*names,
                                action=argparse.BooleanOptionalAction,
                                default=f.default)
        elif f.type in (List[int], "List[int]"):
            parser.add_argument(*names, type=int, nargs="+",
                                default=f.default_factory())
        elif f.type in (List[float], "List[float]"):
            parser.add_argument(*names, type=float, nargs="+",
                                default=f.default_factory())
        elif f.type in (List[str], "List[str]"):
            parser.add_argument(*names, type=str, nargs="+",
                                default=f.default_factory())
        else:
            base = {int: int, float: float, str: str}.get(f.type, str)
            if f.type in (Optional[str], "Optional[str]"):
                base = str
            if f.type in (Optional[int], "Optional[int]"):
                base = int
            default = (
                f.default if f.default is not dataclasses.MISSING else None
            )
            parser.add_argument(*names, type=base, default=default)
    args, _ = parser.parse_known_args(argv)
    cfg = Config(**{
        f.name: getattr(args, f.name) for f in dataclasses.fields(Config)
    })
    cfg = dataclasses.replace(cfg, eval=cfg.eval or cfg.eval_train)
    return cfg
