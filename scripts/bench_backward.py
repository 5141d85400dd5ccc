"""Backward-pass decomposition at bench shapes (VERDICT r3 #4).

Attributes the train step's backward+optimizer time (r3b: 130.4 ms of a
309.7 ms B=24 step, with only "backbone bwd ~51" attributed) to named
stages: backbone, text tower, cross-encoder, decoder stack, prediction
heads, contrastive projections, loss, and the AdamW update itself.

Method: separate-dispatch timing (median of reps, warm executables) of
  fwd(stage)        — jitted stage forward
  fwd+bwd(stage)    — jitted value_and_grad of a sum-loss over the stage
so bwd ≈ fwdbwd − fwd per stage. Dispatch timing pays the axon-tunnel
RTT per call (PERF.md "tunnel variance"); run on a quiet tunnel and read
the FPS canary first — if the canary is off its 31 ms book value, the
session is noisy and numbers should be discarded.

Usage (real chip):   python scripts/bench_backward.py
Smoke (CPU, tiny):   BENCH_TINY=1 JAX_PLATFORMS=cpu python scripts/bench_backward.py
Env: BENCH_BATCH (default 24), BENCH_REPS (default 10).
"""
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the image's sitecustomize preloads jax with the axon TPU platform,
    # so the env var alone is too late — flip through jax.config BEFORE
    # first backend use, or a "CPU" smoke silently becomes a second TPU
    # client and can wedge a chip-resident run's tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")


def timeit(fn, *args, reps=None, warm=2):
    import jax

    reps = reps or int(os.environ.get("BENCH_REPS", "10"))
    try:
        if hasattr(fn, "lower"):
            # raised scoped-VMEM, as bench.py does for B>24: the
            # stage-isolated graphs here (fwd-only / loss-only) schedule
            # more co-resident buffers around the FPS kernel frame than
            # the full train step does, and blow the 16 MB default
            # (measured: 25.5 MB at B=24 — this was the real cause of the
            # r4/r5 "tpu_compile_helper exit 1" crashes on these graphs)
            fn = fn.lower(*args).compile(compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": 65536})
        for _ in range(warm):
            out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1e3  # ms
    except Exception as e:  # keep the rest of the table on a bad compile
        print(f"# timeit FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return float("nan")


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()

    from butd_detr_tpu.data.synthetic import synthetic_batch
    from butd_detr_tpu.lang import roberta_base_config, tiny_roberta_config
    from butd_detr_tpu.losses import compute_hungarian_loss
    from butd_detr_tpu.models.decoder import BiDecoderLayer
    from butd_detr_tpu.models.encoder import BiEncoder
    from butd_detr_tpu.models.heads import ClsAgnosticPredictHead
    from butd_detr_tpu.nn.backbone import Pointnet2Backbone
    from butd_detr_tpu.train import Config, init_state, make_optimizer
    from butd_detr_tpu.train.step import (
        INPUT_KEYS,
        TARGET_KEYS,
        build_model,
        criterion_config,
        make_train_step,
    )

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    B = int(os.environ.get("BENCH_BATCH", "8" if tiny else "24"))
    N = 512 if tiny else 50000
    mno = 8 if tiny else 132
    L = 12 if tiny else 64
    cfg = Config(
        use_contrastive_align=True, use_soft_token_loss=True, butd=True,
        self_attend=True, use_color=True, batch_size=B,
        max_num_obj=mno, max_det_boxes=mno, max_text_len=L,
        **(dict(num_encoder_layers=1, num_decoder_layers=1,
                num_target=16, num_points=N) if tiny else {}),
    )
    npts = (64, 32, 16, 8) if tiny else (2048, 1024, 512, 256)
    rcfg = tiny_roberta_config() if tiny else roberta_base_config()
    model = build_model(cfg, roberta_config=rcfg, backbone_npoints=npts)
    batch = synthetic_batch(batch_size=B, num_points=N, num_feats=3,
                            max_text_len=L, max_num_obj=mno,
                            max_det_boxes=mno)
    optimizer = make_optimizer(cfg, steps_per_epoch=1000)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    state = init_state(model, optimizer, batch, rng)
    print(f"# init {time.time()-t0:.0f}s", flush=True)

    results = {}

    # ---- canary: FPS tier1 (code unchanged across rounds; book 31 ms)
    from butd_detr_tpu.ops import furthest_point_sample

    pc = jnp.asarray(batch["point_clouds"][..., :3])
    fps = jax.jit(lambda x: furthest_point_sample(x, npts[0]))
    results["canary_fps_tier1"] = timeit(fps, pc)

    # ---- full step + loss_fn value/grad
    inputs = {k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch}
    crit_cfg = criterion_config(cfg)

    def loss_fn(params):
        end_points, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            inputs, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        for k in TARGET_KEYS:
            end_points[k] = jnp.asarray(batch[k])
        loss, _ = compute_hungarian_loss(
            end_points, cfg.num_decoder_layers, crit_cfg,
            cfg.query_points_obj_topk,
        )
        return loss

    step = jax.jit(make_train_step(model, cfg, optimizer),
                   donate_argnums=())
    results["full_step"] = timeit(step, state, batch, rng)
    # value/grad of the standalone loss graph LAST-ish ordering inside
    # this block: each stage below tolerates a failed compile (NaN row),
    # so a flaky remote-compile on one executable no longer kills the
    # attribution table (r4/r5 observed tpu_compile_helper crashes here)
    results["fwd_loss_value"] = timeit(jax.jit(loss_fn), state.params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    results["fwd_loss_grad"] = timeit(vg, state.params)
    results["bwd_total"] = results["fwd_loss_grad"] - results["fwd_loss_value"]

    # ---- optimizer alone (update + apply on real-shaped grads)
    try:
        _, grads = vg(state.params)
    except Exception:
        grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def opt_only(g, s):
        updates, _ = optimizer.update(g, s.opt_state, s.params)
        import optax

        return optax.apply_updates(s.params, updates)

    results["adamw_update"] = timeit(jax.jit(opt_only), grads, state)

    # ---- backbone stage
    bb = Pointnet2Backbone(
        input_feature_dim=model.input_feature_dim, output_dim=288,
        npoints=model.backbone_npoints,
        input_presorted=model.input_presorted,
        dtype=model.backbone_dtype or model.dtype,
    )
    bparams = state.params["backbone_net"]
    bstats = state.batch_stats["backbone_net"]
    pc6 = jnp.asarray(batch["point_clouds"])

    def bb_fwd(p):
        ep, _ = bb.apply({"params": p, "batch_stats": bstats}, pc6,
                         train=True, mutable=["batch_stats"])
        return ep["fp2_features"].astype(jnp.float32).sum()

    results["backbone_fwd"] = timeit(jax.jit(bb_fwd), bparams)
    results["backbone_fwdbwd"] = timeit(jax.jit(jax.grad(bb_fwd)), bparams)

    # ---- text tower (frozen in the real step: fwd only)
    from butd_detr_tpu.lang.roberta import RobertaModel

    rob = RobertaModel(rcfg, dtype=model.dtype)
    rp = state.params["text_encoder"]
    tids = jnp.asarray(batch["text_ids"])
    tmask = jnp.asarray(batch["text_mask"])
    results["text_fwd"] = timeit(
        jax.jit(lambda p: rob.apply({"params": p}, tids, tmask,
                                    train=False).sum()), rp)

    # ---- cross-encoder stage (representative activations)
    K = npts[1]  # 1024 seeds
    key = jax.random.PRNGKey(1)
    vis = jax.random.normal(key, (B, K, 288), model.dtype)
    pos = jax.random.normal(key, (B, K, 288), model.dtype)
    txt = jax.random.normal(key, (B, L, 288), model.dtype)
    det = jax.random.normal(key, (B, mno, 288), model.dtype)
    vmask = jnp.zeros((B, K), bool)
    tmask_pad = jnp.asarray(batch["text_mask"]) == 0
    dmask = ~jnp.asarray(batch["det_bbox_label_mask"])
    enc = BiEncoder(num_layers=cfg.num_encoder_layers, d_model=288,
                    n_heads=8, dim_feedforward=256, dropout=0.1,
                    self_attend=True, use_butd_enc_attn=True,
                    dtype=model.dtype)
    eparams = state.params["cross_encoder"]

    def enc_fwd(p, v, t):
        o1, o2 = enc.apply({"params": p}, v, pos, vmask, t, tmask_pad,
                           det, dmask, train=True,
                           rngs={"dropout": rng})
        return o1.astype(jnp.float32).sum() + o2.astype(jnp.float32).sum()

    results["encoder_fwd"] = timeit(jax.jit(enc_fwd), eparams, vis, txt)
    results["encoder_fwdbwd"] = timeit(
        jax.jit(jax.grad(enc_fwd, argnums=(0, 1, 2))), eparams, vis, txt)

    # ---- decoder stack (6 sequential layers)
    Q = cfg.num_target
    qry = jax.random.normal(key, (B, Q, 288), model.dtype)
    qpos = jax.random.normal(key, (B, Q, 6), model.dtype)
    dparams = {i: state.params[f"decoder_{i}"]
               for i in range(cfg.num_decoder_layers)}
    dstats = {i: state.batch_stats[f"decoder_{i}"]
              for i in range(cfg.num_decoder_layers)}
    dec = BiDecoderLayer(288, n_heads=8, dim_feedforward=256, dropout=0.1,
                         self_position_embedding="loc_learned", butd=True,
                         dtype=model.dtype)

    def dec_fwd(ps, q, v, t):
        for i in range(cfg.num_decoder_layers):
            q, _ = dec.apply(
                {"params": ps[i], "batch_stats": dstats[i]}, q, v, t,
                qpos, None, tmask_pad, det, dmask, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
        return q.astype(jnp.float32).sum()

    results["decoder_fwd"] = timeit(jax.jit(dec_fwd), dparams, qry, vis, txt)
    results["decoder_fwdbwd"] = timeit(
        jax.jit(jax.grad(dec_fwd, argnums=(0, 1, 2, 3))),
        dparams, qry, vis, txt)

    # ---- prediction heads (proposal + N layer heads)
    heads = {"proposal_head": state.params["proposal_head"]}
    for i in range(cfg.num_decoder_layers):
        heads[f"prediction_head_{i}"] = state.params[f"prediction_head_{i}"]
    hd = ClsAgnosticPredictHead(256, 288, dtype=model.dtype)
    cxyz = jax.random.normal(key, (B, Q, 3), jnp.float32)

    hstats = {"proposal_head": state.batch_stats["proposal_head"]}
    for i in range(cfg.num_decoder_layers):
        hstats[f"prediction_head_{i}"] = (
            state.batch_stats[f"prediction_head_{i}"]
        )

    def heads_fwd(ps, q):
        tot = jnp.zeros((), jnp.float32)
        for name, p in ps.items():
            out, _ = hd.apply(
                {"params": p, "batch_stats": hstats[name]}, q, cxyz,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            tot += sum(v.astype(jnp.float32).sum() for v in out.values())
        return tot

    results["heads7_fwd"] = timeit(jax.jit(heads_fwd), heads, qry)
    results["heads7_fwdbwd"] = timeit(
        jax.jit(jax.grad(heads_fwd, argnums=(0, 1))), heads, qry)

    # ---- loss stage: real end_points, grad wrt prediction tensors
    ep_real = jax.jit(
        lambda p: model.apply(
            {"params": p, "batch_stats": state.batch_stats}, inputs,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})[0]
    )(state.params)
    for k in TARGET_KEYS:
        ep_real[k] = jnp.asarray(batch[k])
    diff_keys = [k for k in ep_real
                 if any(k.endswith(s) for s in
                        ("center", "pred_size", "sem_cls_scores",
                         "proj_queries", "proj_tokens"))
                 or k == "seeds_obj_cls_logits"]

    def loss_only(dvars, rest):
        ep = dict(rest)
        ep.update(dvars)
        loss, _ = compute_hungarian_loss(
            ep, cfg.num_decoder_layers, crit_cfg,
            cfg.query_points_obj_topk)
        return loss

    dvars = {k: ep_real[k] for k in diff_keys}
    rest = {k: v for k, v in ep_real.items() if k not in diff_keys}
    results["loss_fwd"] = timeit(jax.jit(loss_only), dvars, rest)
    results["loss_fwdbwd"] = timeit(
        jax.jit(jax.grad(loss_only)), dvars, rest)

    # ---- derived backward attribution
    for s in ("backbone", "encoder", "decoder", "heads7", "loss"):
        results[f"{s}_bwd"] = results[f"{s}_fwdbwd"] - results[f"{s}_fwd"]

    out = {k: round(v, 2) for k, v in results.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
