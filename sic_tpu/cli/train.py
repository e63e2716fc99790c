"""train CLI — the explicit training entry point the reference lacks.

(The reference expresses training only as a LightningModule + YAML trainer
section and expects an external Lightning ``main.py``; SURVEY.md §1 note.)

Drives the 3-stage schedule (``feat_wo_bpp`` -> ``feat`` -> ``pix``) with
the validation-bpp lambda controller and orbax checkpoints.  Accepts either
a reference-layout YAML (--base_config) or a QP preset (--qp/--train_px).
"""
from __future__ import annotations

import argparse
import json
import sys


import jax



def main(argv=None):
    from ._common import enable_compile_cache, respect_platform_env
    respect_platform_env()
    enable_compile_cache()
    ap = argparse.ArgumentParser(description="sic_tpu train")
    ap.add_argument("--base_config", type=str, default=None,
                    help="reference-layout training YAML")
    ap.add_argument("--qp", type=int, default=None, choices=(0, 1, 2, 3),
                    help="rate preset instead of a YAML")
    ap.add_argument("--train_px", type=int, default=256, choices=(256, 512))
    ap.add_argument("--train_list", type=str, default=None,
                    help="txt file of training image paths")
    ap.add_argument("--val_list", type=str, default=None)
    ap.add_argument("--train_dir", type=str, default=None,
                    help="image directory alternative to --train_list")
    ap.add_argument("--val_dir", type=str, default=None)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--ckpt_dir", type=str, default="./ckpts")
    ap.add_argument("--log_dir", type=str, default=None,
                    help="write TensorBoard event files + scalars.jsonl "
                         "here (reference: Lightning's TB logger)")
    ap.add_argument("--resume", type=str, default=None,
                    help="orbax training-state checkpoint to resume")
    ap.add_argument("--reset_schedule", action="store_true",
                    help="resume weights but restart the stage schedule "
                         "(the reference's ignore_keys=['epoch_for_strategy',"
                         "'lmbda_idx','lmbda_list'])")
    ap.add_argument("--perceptual", type=str, default=None,
                    choices=("lpips", "msssim", "none"),
                    help="pix-stage perceptual term (default lpips; use "
                         "msssim when no VGG16 checkpoint is available — "
                         "uncalibrated lpips warns loudly)")
    ap.add_argument("--lpips_lin", type=str, default=None,
                    help="torch ckpt of LPIPS calibration heads (vgg.pth)")
    ap.add_argument("--lpips_vgg", type=str, default=None,
                    help="torchvision VGG16 checkpoint for the LPIPS backbone")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny spec for smoke runs")
    ap.add_argument("--insert_pos", type=int, nargs="+", default=None,
                    help="override the trunk cross-attn insert positions "
                         "(reference: config_test.yaml in_pos_enc/dec)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_donate", action="store_true",
                    help="disable cross-step buffer donation")
    ap.add_argument("--f32_frozen", action="store_true",
                    help="keep frozen backbones in f32 (default bf16 on TPU)")
    ap.add_argument("--world_size", type=int, default=None,
                    help="processes for multi-host data parallel "
                         "(default: WORLD_SIZE env)")
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None,
                    help="host:port of process 0 "
                         "(default: MASTER_ADDR:MASTER_PORT env)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways over local devices "
                         "(Megatron column/row sharding of the ViT/Swin "
                         "blocks; parallel.tp_sharding)")
    ap.add_argument("--tile", type=int, default=1,
                    help="spatial-parallel ways: image width sharded over "
                         "a 'tile' mesh axis (conv halos via GSPMD)")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-shard params + optimizer state over the "
                         "data axis (all-gather on use)")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel stages over a 'pipe' mesh axis: "
                         "the hybrid ViT trunks switch to the stacked-cell "
                         "layout, each stage holds 1/pp of the trunk params "
                         "+ Adam moments, microbatches ride a ppermute ring "
                         "(parallel.spmd_pipeline); composes with data "
                         "parallelism over the remaining devices")
    ap.add_argument("--pp_microbatch", type=int, default=None,
                    help="pipeline microbatches (default: pp stages)")
    args = ap.parse_args(argv)

    # multi-host DP: one global mesh over every process's devices; batches
    # are rank-sliced locally and assembled into global arrays, XLA inserts
    # the cross-host gradient all-reduces (the Lightning-DDP counterpart,
    # reference: codec_sq_fixbpp.py:644 strategy.reduce / sync_dist logging)
    from ..parallel.multihost import setup_distributed
    rank, world = setup_distributed(args.rank, args.world_size,
                                    args.coordinator)

    from ..config import (flagship_spec, load_config, qp_strategy, tiny_spec)
    from ..data import ImageDataset
    from ..train import (FeatLossCfg, ImgLossCfg, Trainer,
                         create_train_state, load_checkpoint)

    if args.base_config:
        cfg = load_config(args.base_config)
        spec, strategy = cfg.spec, cfg.strategy
        feat_cfg, img_cfg = cfg.feat_cfg, cfg.img_cfg
        tune_titok = cfg.tune_titok
    else:
        spec = tiny_spec() if args.tiny else flagship_spec()
        strategy = qp_strategy(args.qp if args.qp is not None else 0,
                               args.train_px)
        feat_cfg, img_cfg = FeatLossCfg(), ImgLossCfg()
        tune_titok = False
    if args.insert_pos is not None:
        import dataclasses
        spec = dataclasses.replace(spec,
                                   insert_pos_enc=tuple(args.insert_pos),
                                   insert_pos_dec=tuple(args.insert_pos))
    if args.perceptual is not None:
        import dataclasses
        img_cfg = dataclasses.replace(img_cfg, perceptual=args.perceptual)
    print(f"[train] perceptual mode: {img_cfg.perceptual}"
          + ("" if img_cfg.perceptual != "lpips" or args.lpips_vgg
             else " (UNCALIBRATED — no --lpips_vgg)"), file=sys.stderr)

    if args.train_list:
        train_ds = ImageDataset.from_list_file(args.train_list,
                                               size=args.train_px, train=True)
    elif args.train_dir:
        train_ds = ImageDataset.from_dir(args.train_dir, size=args.train_px,
                                         train=True)
    else:
        ap.error("need --train_list or --train_dir")
    if args.val_list:
        val_ds = ImageDataset.from_list_file(args.val_list,
                                             size=args.train_px, train=False)
    elif args.val_dir:
        val_ds = ImageDataset.from_dir(args.val_dir, size=args.train_px,
                                       train=False)
    else:
        val_ds = None

    import jax.numpy as jnp
    on_tpu = jax.devices()[0].platform != "cpu"

    pp_cfg, pp_mesh = None, None
    if args.pp > 1:
        # PP over 'pipe' x DP over 'data' on one 2D mesh.  The trunk-cell
        # count must divide by the stage count (models/hybrid.py
        # cell_partition); remaining local devices carry data parallelism.
        if world > 1 or args.tp > 1 or args.tile > 1:
            ap.error("--pp composes with --fsdp and data parallelism; "
                     "not with --tp/--tile or multi-host runs")
        from ..models.hybrid import PPConfig, cell_partition
        from ..parallel import make_mesh
        n_local = len(jax.devices())
        if n_local % args.pp:
            ap.error(f"{n_local} devices not divisible by pp={args.pp}")
        # both trunks must partition: YAML configs may set in_pos_dec
        # differently from in_pos_enc (config.py), and a bad decoder
        # partition would otherwise surface as an opaque shard_map
        # failure inside the jitted step
        n_cells = None
        for side, ipos in (("encoder", spec.insert_pos_enc),
                           ("decoder", spec.insert_pos_dec)):
            n = spec.titok.num_layers // cell_partition(
                spec.titok.num_layers, ipos)
            if n % args.pp:
                ap.error(f"{side} trunk has {n} pipeline cells; --pp must "
                         f"divide it (got {args.pp})")
            n_cells = n if side == "encoder" else n_cells
        data_ways = n_local // args.pp
        pp_mesh = make_mesh(shape=(data_ways, args.pp),
                            axis_names=("data", "pipe"))
        pp_cfg = PPConfig(mesh=pp_mesh, axis="pipe",
                          batch_axis="data" if data_ways > 1 else None,
                          n_microbatch=args.pp_microbatch)
        print(f"[train] pipeline parallel: {args.pp} stages x "
              f"{data_ways} data, {n_cells} cells", file=sys.stderr)

    codec, state, steps = create_train_state(
        spec, strategy, jax.random.PRNGKey(args.seed),
        feat_cfg=feat_cfg, img_cfg=img_cfg,
        image_hw=(args.train_px, args.train_px), tune_titok=tune_titok,
        donate=not args.no_donate,
        mu_dtype=jnp.bfloat16 if on_tpu else None,
        frozen_dtype=None if (args.f32_frozen or not on_tpu) else jnp.bfloat16,
        lpips_lin=args.lpips_lin, lpips_vgg=args.lpips_vgg, pp=pp_cfg)
    if args.resume:
        try:
            resumed = load_checkpoint(args.resume, state)
        except Exception:
            # Layout-independent fallback: a bare codec-params checkpoint
            # (e.g. the canonical `deploy_params` written at the end of
            # every run, or a --pp run resuming a non-PP checkpoint and
            # vice versa).  Params-only warm start — optimizer/schedule
            # state restarts fresh.
            from ..checkpoint import load_codec_params
            from ..parallel import (codec_params_canonicalize,
                                    codec_params_stack)
            loaded = load_codec_params(args.resume, spec,
                                       image_hw=(args.train_px,) * 2)
            conv = (codec_params_stack if pp_cfg is not None
                    else codec_params_canonicalize)
            loaded = conv({"params": loaded["params"]}, spec)
            grafted = jax.tree.map(lambda t, s: jnp.asarray(s, t.dtype),
                                   state.params, loaded)
            resumed = state.replace(params=grafted)
            print(f"[train] params-only warm start from {args.resume} "
                  "(optimizer state fresh)", file=sys.stderr)
        if args.reset_schedule:
            resumed = resumed.replace(
                epoch_for_strategy=state.epoch_for_strategy,
                lmbda_idx=state.lmbda_idx, lmbda_list=state.lmbda_list)
        state = resumed

    writer = None
    if args.log_dir:
        from ..utils.tb_writer import MetricsWriter
        writer = MetricsWriter(args.log_dir)
        tb_log = writer.as_log_fn()

    def log_fn(d):
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in d.items()}), file=sys.stderr, flush=True)
        if writer is not None:
            tb_log(d)

    globalize = lambda b: b
    if pp_cfg is not None:
        from ..parallel import batch_sharding, shard_state_pp
        mb = args.pp_microbatch or args.pp
        per_mb = args.batch_size // mb if args.batch_size % mb == 0 else 0
        if not per_mb or per_mb % pp_mesh.shape["data"]:
            ap.error(f"--batch_size {args.batch_size} must be a multiple of "
                     f"microbatches*data = {mb}*{pp_mesh.shape['data']} "
                     "(each microbatch shards over the data axis)")
        state = shard_state_pp(state, pp_mesh, axis="pipe",
                               fsdp_axis="data" if args.fsdp else None)
        globalize = lambda b: jax.device_put(jnp.asarray(b),
                                             batch_sharding(pp_mesh))
    elif args.tp > 1 or args.tile > 1 or args.fsdp:
        # single-process mesh parallelism: TP over 'model', spatial over
        # 'tile', remaining devices on 'data'; optional ZeRO over 'data'.
        if world > 1:
            ap.error("--tp/--tile/--fsdp are single-process mesh knobs; "
                     "combine multi-host runs with DP only")
        import os
        n_local = len(jax.devices())
        ways = args.tp * args.tile
        if n_local % ways:
            ap.error(f"{n_local} devices not divisible by tp*tile={ways}")
        if args.tp > 1 and os.environ.get("SIC_SEQ_ATTN", "pallas") == "pallas":
            # the fused attention kernel wants whole heads per device; the
            # XLA einsum path partitions cleanly under GSPMD
            os.environ["SIC_SEQ_ATTN"] = "xla"
            print("[train] --tp: SIC_SEQ_ATTN=xla (GSPMD-partitionable "
                  "attention)", file=sys.stderr)
        from ..parallel import (make_mesh, shard_batch, shard_state,
                                shard_state_fsdp, shard_state_tp)
        mesh = make_mesh(shape=(n_local // ways, args.tp, args.tile),
                         axis_names=("data", "model", "tile"))
        if args.batch_size % mesh.shape["data"]:
            ap.error(f"--batch_size {args.batch_size} must divide by the "
                     f"data-axis size {mesh.shape['data']}")
        if args.tp > 1:
            state = shard_state_tp(
                state, mesh, fsdp_axis="data" if args.fsdp else None)
        elif args.fsdp:
            state = shard_state_fsdp(state, mesh)
        else:
            state = shard_state(state, mesh)
        print(f"[train] mesh {dict(mesh.shape)}"
              + (" + ZeRO over data" if args.fsdp else ""), file=sys.stderr)
        globalize = lambda b: shard_batch(jnp.asarray(b), mesh)
    if world > 1:
        import numpy as np
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        from ..parallel import make_mesh
        if args.batch_size % world:
            ap.error(f"--batch_size {args.batch_size} must divide by "
                     f"world_size {world}")
        mesh = make_mesh(shape=(len(jax.devices()), 1))
        per = args.batch_size // world

        def globalize(batch):
            # every process iterates the same deterministic batch sequence;
            # each contributes its contiguous rank-block of the global batch
            local = np.asarray(batch)[rank * per:(rank + 1) * per]
            spec = P("data", *([None] * (local.ndim - 1)))
            return multihost_utils.host_local_array_to_global_array(
                local, mesh, spec)

        state = multihost_utils.host_local_array_to_global_array(
            jax.tree.map(lambda x: np.asarray(x), state), mesh, P())

    epoch0 = [int(state.epoch_for_strategy)]
    # ckpt_dir on EVERY rank: orbax checkpointing is a collective in
    # multi-process runs (all ranks enter its commit barriers; process 0
    # writes the replicated data) -- a rank-0-only save deadlocks
    trainer = Trainer(codec, state, steps, strategy,
                      ckpt_dir=args.ckpt_dir,
                      log_fn=log_fn if rank == 0 else (lambda d: None))

    # PP mode: a partial final batch can't satisfy the microbatch x data
    # sharding (and every distinct batch shape would be a fresh pipeline
    # compile) — drop remainders, as GPipe schedulers conventionally do
    full_only = ((lambda b: len(b) == args.batch_size) if pp_cfg is not None
                 else (lambda b: True))

    def train_data():
        e = int(trainer.state.epoch_for_strategy)
        return map(globalize, filter(full_only,
                                     train_ds.batches(args.batch_size,
                                                      epoch=e)))

    def val_data():
        return map(globalize,
                   filter(full_only,
                          val_ds.batches(args.batch_size, shuffle=False))) \
            if val_ds else iter(())

    trainer.fit(train_data, val_data if val_ds else None, epochs=args.epochs)
    if world == 1:
        # canonical deployment-params checkpoint: what evaluate/compress/
        # serve load (load_codec_params).  Always in the NAMED
        # transformer_{i} layout — a --pp run's stacked trunk_cells are an
        # execution detail, not a wire format (round-4 advisor finding:
        # PP-trained checkpoints were unloadable by the deploy CLIs).
        from pathlib import Path

        import numpy as np

        from ..checkpoint import save_codec_params
        deploy = {"params": jax.tree.map(
            lambda x: np.asarray(x), trainer.state.params["params"])}
        if pp_cfg is not None:
            from ..parallel import codec_params_canonicalize
            deploy = codec_params_canonicalize(deploy, spec)
        dp = save_codec_params(Path(args.ckpt_dir) / "deploy_params", deploy)
        print(f"[train] deployment params -> {dp}", file=sys.stderr)
    if writer is not None:
        writer.close()
    if world > 1:
        # align the ranks before interpreter exit: rank 0's trailing work
        # (orbax checkpoint write, log flush) otherwise leaves the other
        # ranks waiting at jax.distributed's SHUTDOWN barrier, whose
        # deadline is not ours to raise (reference: dist.barrier() before
        # teardown, compress.py:293)
        from ..parallel.multihost import barrier
        barrier("end_of_training")
    print(f"[OK] training done; checkpoints in {args.ckpt_dir}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
