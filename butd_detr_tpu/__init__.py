"""BUTD-DETR-TPU: a TPU-native (JAX/XLA/Pallas) 3D visual-grounding framework.

A from-scratch rebuild of the capabilities of BUTD-DETR ("Bottom Up Top Down
Detection Transformers for Language Grounding in Images and Point Clouds",
ECCV 2022) designed for TPU hardware: fixed shapes everywhere, pure functional
modules, pjit/shard_map data parallelism over a device mesh, and Pallas
kernels for the point-cloud hot ops.

Layer map (mirrors reference layers, see SURVEY.md):
  ops/      - point-cloud primitives (FPS, ball query, 3NN, grouping)
  nn/       - shared MLP / PointNet++ set-abstraction + feature-propagation
  lang/     - RoBERTa text encoder (JAX) + tokenizer utilities + span predictor
  models/   - BeaUTyDETR: cross-modal encoder, decoder, prediction heads
  losses/   - Hungarian matcher (on-device), set criterion, focal/contrastive
  data/     - ScanNet scans, SR3D/NR3D/ScanRefer datasets, augmentation
  parallel/ - mesh construction and sharding rules
  train/    - config, optimizer, train/eval steps, checkpointing
  eval/     - grounding evaluators, detection AP, NMS
"""

__version__ = "0.1.0"
