#!/usr/bin/env python
"""Train a LEAF + CNN classifier on a TPU slice (or CPU) — the TPU-native
replacement for the reference's train.py / train_xla.py drivers.

One SPMD process drives the whole local slice: a 1-D 'data' mesh, batches
sharded over it, params replicated, the entire step (augmented forward, loss,
grads, all-reduce, optimizer, metrics) as ONE jitted program. Contrast with
the reference (train_xla.py:369-375): per-core process spawn, host-side
metric rendezvous (xm.mesh_reduce 296,303), per-step loss.item() sync (291),
master-only validation (312-338) — all replaced by on-device epoch
accumulators and full-mesh validation.

Example (flagship SpeechCommands recipe, reference README.md:59-62):
  python train.py --cfg_file cfgs/speechcommands/efficientnet-b0-leaf-default.cfg \
      --expdir ./exp_scv2_b0 --epochs 100 --random_seed 8881
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    # Flag parity with reference train_xla.py:55-91.
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg_file", type=str, required=True)
    p.add_argument("--expdir", type=str, required=True)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--host_aug", action="store_true",
                   help="run ALL augments on the host "
                        "(leaf_supervised_transforms) instead of the "
                        "default host-crop + on-device augment split")
    p.add_argument("--high_aug", action="store_true",
                   help="use the heavier get_raw_transforms_v2 pipeline "
                        "(background-noise SNR mixing + time masking) "
                        "instead of leaf_supervised_transforms")
    p.add_argument("--use_packed_dataset", action="store_true")
    p.add_argument("--cropped_read", action="store_true")
    p.add_argument("--gcs_bucket_name", type=str, default=None)
    p.add_argument("--continue_from_ckpt", type=str, default=None)
    p.add_argument("--random_seed", type=int, default=8881)
    p.add_argument("--log_steps", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint every N epochs (default 1 = per-epoch,"
                        " the reference's cadence, train_xla.py:356). The"
                        " last epoch always saves; epochs that improve the"
                        " val metric always save (test.py-style best-ckpt"
                        " selection stays exact). Useful on hosts where"
                        " the per-epoch orbax save dominates short epochs.")
    p.add_argument("--n_devices", type=int, default=None,
                   help="restrict to first N devices (default: all)")
    p.add_argument("--batch_mode", choices=("per_device", "global"),
                   default="per_device",
                   help="'per_device' (default, reference parity): cfg "
                        "batch_size counts clips PER CHIP — global batch "
                        "= batch_size × n_devices, like the reference's "
                        "per-core DataLoaders (train_xla.py:176,192-194). "
                        "'global': cfg batch_size is the total batch "
                        "sharded over the mesh.")
    p.add_argument("--labels_delimiter", type=str, default=",")
    p.add_argument("--no_wandb", action="store_true", default=True)
    p.add_argument("--wandb_project", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_tags", type=str, default=None)
    p.add_argument("--wandb_watch_model", "--watch_model",
                   dest="watch_model", action="store_true",
                   help="log global + per-submodule param/grad L2 norms "
                        "every log_steps (the reference's "
                        "wandb.watch(model), train_xla.py:243-244)")
    p.add_argument("--watch_histograms", action="store_true",
                   help="also log per-tensor param/grad HISTOGRAMS every "
                        "log_steps — the full wandb.watch(log='all') "
                        "equivalent (train_xla.py:243-244); bucket counts "
                        "are computed on device, only ~80 kB/snapshot "
                        "crosses to host. Implies --wandb_watch_model.")
    p.add_argument("--wire_dtype", choices=("auto", "float32", "int16"),
                   default="auto",
                   help="host→device waveform format. 'int16' ships raw "
                        "PCM (4× less transfer + cache RAM, decoded on "
                        "device, bit-identical for 16-bit sources); 'auto' "
                        "picks int16 whenever the host pipeline is "
                        "scale-equivariant (crop/pad only)")
    p.add_argument("--bf16", action="store_true",
                   help="run the model in bfloat16 compute (fp32 params)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="fuse K optimizer steps into one compiled program "
                        "(lax.scan): the host dispatches once per K steps, "
                        "hiding per-step dispatch overhead (~2.3 ms/step "
                        "on the profiled v5e step, BASELINE.md). Numerics "
                        "are identical to K single steps. Forced to 1 when "
                        "--wandb_watch_model/--watch_histograms need "
                        "per-step metrics.")
    p.add_argument("--bn_recalibrate", type=int, default=0, metavar="N",
                   help="before each validation pass, re-estimate the "
                        "BatchNorm running statistics from N train batches "
                        "with FROZEN parameters (cycling the loader if the "
                        "epoch is shorter). EfficientNet's torch-parity BN "
                        "momentum 0.99 lags the parameters by O(1000) "
                        "steps, so short runs eval with stale stats "
                        "(CONVERGENCE.md: 40-epoch flagship at 0.531 with "
                        "train-mode val at 1.00); N batches recover "
                        "1-0.99^N of the gap (~400 for 98%). 0 = off.")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (cpu/tpu) before first use")
    p.add_argument("--compilation_cache_dir", type=str,
                   default=os.path.expanduser("~/.cache/leaf_tpu_xla"),
                   help="persistent XLA compile cache (resume/restart "
                        "skips recompiles); '' disables")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "slices (coordinator from TPU env vars); each host "
                        "then loads its manifest shard via process_index")
    return p.parse_args()


def train(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    if args.compilation_cache_dir:
        # Persistent XLA compile cache: repeated runs (and especially
        # preemption auto-resume, which restarts the process) skip the
        # ~40 s train-step compile. Keyed by HLO hash — safe across cfgs.
        os.makedirs(args.compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.multihost:
        # Real TPU pods: coordinator/process-count come from the TPU
        # metadata (zero-arg initialize). The 2-process CPU simulation
        # (tests/test_multihost_train.py) passes them explicitly via
        # LEAF_COORDINATOR / LEAF_NUM_PROCESSES / LEAF_PROCESS_ID and uses
        # gloo for cross-process CPU collectives.
        coord = os.environ.get("LEAF_COORDINATOR")
        if coord:
            if args.platform == "cpu":
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo")
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["LEAF_NUM_PROCESSES"]),
                process_id=int(os.environ["LEAF_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
    import jax.numpy as jnp

    from leaf_tpu.data import (RawWaveformDataset, PackedDataset,
                               leaf_supervised_transforms, setup_dataloaders)
    from leaf_tpu.models import Classifier
    from leaf_tpu.parallel import (loader_batch_size, make_mesh, shard_batch,
                                   shard_params)
    from leaf_tpu.training import (TrainState, get_config, make_eval_step,
                                   make_train_step, optimization_helper)
    from leaf_tpu.training.checkpoint import (apply_pretrained_frontend,
                                              load_checkpoint,
                                              save_checkpoint, save_hparams)
    from leaf_tpu.training.loggers import RateTracker, TrainLogger

    np.random.seed(args.random_seed)
    cfg = get_config(args.cfg_file)
    if args.bf16:
        # frontend + backbone compute in bfloat16 (f32 params/PCEN/
        # contraction accumulators)
        cfg["frontend"]["compute_dtype"] = "bfloat16"
        cfg["model"]["compute_dtype"] = "bfloat16"
    mode = cfg["model"]["type"]
    multiclass = mode == "multiclass"
    ac = cfg["audio_config"]
    sr = int(ac["sample_rate"])
    tr_clip = int(float(ac.get("random_clip_size", 2.5)) * sr)
    val_clip = int(float(ac.get("val_clip_size", 2.5)) * sr)
    batch_size = int(cfg["opt"]["batch_size"])
    use_mixup = bool(ac.get("mixup", False))

    mesh = make_mesh(args.n_devices)
    n_dev = mesh.devices.size
    world = jax.process_count()
    rank = jax.process_index()
    is_master = rank == 0

    logger = TrainLogger(
        args.expdir, is_master=is_master,
        wandb_config=None if args.no_wandb else {
            "project": args.wandb_project,
            "group": args.wandb_group,
            "tags": args.wandb_tags.split(",") if args.wandb_tags else None,
            "name": os.path.basename(args.expdir),
            "config": cfg,
        })
    # batch semantics: loader batch per process (see loader_batch_size —
    # default 'per_device' matches the reference's effective batch at any
    # device count; PARITY.md §2.8)
    loader_bs = loader_batch_size(batch_size, n_dev, world, args.batch_mode)
    logger.print(f"devices: {n_dev} | processes: {world} | mode: {mode} | "
                 f"batch/step: {loader_bs * world} ({args.batch_mode})")

    # ------------------------------------------------------------- data
    if args.high_aug:
        # reference train_xla.py:135-139
        from leaf_tpu.data import get_raw_transforms_v2
        bg = cfg["data"].get("background_noise_dir")
        tr_tfs = get_raw_transforms_v2(
            True, tr_clip, sample_rate=sr,
            min_duration=float(ac.get("min_duration", 1)),
            background_noise_path=bg)
        val_tfs = get_raw_transforms_v2(False, val_clip, sample_rate=sr,
                                        center_crop_val=True)
    elif args.host_aug:
        tr_tfs = leaf_supervised_transforms(True, tr_clip, sr)
        val_tfs = leaf_supervised_transforms(False, val_clip, sr)
    else:
        # default: crop on host, elementwise augments on device — same
        # distribution as leaf_supervised_transforms at ~10× host throughput
        from leaf_tpu.data.transforms import leaf_host_crop_transforms
        tr_tfs = leaf_host_crop_transforms(True, tr_clip)
        val_tfs = leaf_host_crop_transforms(False, val_clip)
    ds_cls = PackedDataset if args.use_packed_dataset else RawWaveformDataset
    wire = args.wire_dtype
    # int16 wire needs every host-side op to be scale-equivariant: true
    # for the default crop-only pipeline, not for host-side gain/noise/
    # normalization (packed shards decode via the float byte-reader and
    # keep float32).
    int16_ok = (not args.use_packed_dataset and not args.host_aug
                and not args.high_aug and not ac.get("normalize", False))
    if wire == "auto":
        wire = "int16" if int16_ok else "float32"
    elif wire == "int16" and not int16_ok:
        raise SystemExit(
            "--wire_dtype int16 is incompatible with --host_aug/"
            "--high_aug/--use_packed_dataset/audio_config.normalize: "
            "those host pipelines are not scale-equivariant (int16 would "
            "silently quantize augmented waveforms to {-1,0,1})")
    if args.use_packed_dataset:
        extra = {"gcs_bucket_path": args.gcs_bucket_name}
    else:
        extra = {"in_memory": bool(cfg["data"].get("in_memory", False)),
                 "wire_dtype": wire}
    train_set = ds_cls(cfg["data"]["train"], cfg["data"]["labels"], ac,
                       mode=mode, delimiter=args.labels_delimiter,
                       transform=tr_tfs, cropped_read=args.cropped_read,
                       **extra)
    val_set = ds_cls(cfg["data"]["val"], cfg["data"]["labels"], ac,
                     mode=mode, delimiter=args.labels_delimiter,
                     transform=val_tfs, is_val=True, **extra)
    train_loader, val_loader = setup_dataloaders(
        train_set, val_set, loader_bs,
        device_world_size=world, local_rank=rank,
        target_len=tr_clip, val_target_len=val_clip,
        multiclass=multiclass, num_workers=args.num_workers,
        multi_device_val=True, packed=args.use_packed_dataset,
        seed=args.random_seed)
    steps_per_epoch = len(train_loader)
    logger.print(f"train batches/epoch: {steps_per_epoch} | "
                 f"val batches: {len(val_loader)}")

    # ------------------------------------------------------------ model
    model = Classifier(cfg=cfg)
    rng = jax.random.PRNGKey(args.random_seed)
    sample = jnp.zeros((2, tr_clip), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, sample, train=False)
    # config-driven pretrained LEAF frontend (reference
    # frontend_helper.py:12-14,52-53)
    new_params, pre_path = apply_pretrained_frontend(cfg, variables["params"])
    if pre_path is not None:
        variables = {**variables, "params": new_params}
        logger.print(f"loaded pretrained frontend from {pre_path}")
    tx, plateau, sched_name = optimization_helper(
        cfg, num_devices=n_dev,
        num_tr_steps_per_epoch=steps_per_epoch, num_epochs=args.epochs)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    logger.print(f"model params: {n_params:,}")

    start_epoch = 0
    if args.continue_from_ckpt:
        if args.continue_from_ckpt == "latest":
            # auto-resume after preemption
            from leaf_tpu.training.checkpoint import latest_checkpoint
            args.continue_from_ckpt = latest_checkpoint(args.expdir)
            if args.continue_from_ckpt is None:
                logger.print("no checkpoint to resume; starting fresh")
    if args.continue_from_ckpt:
        state, meta = load_checkpoint(args.continue_from_ckpt, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        if plateau is not None and "scheduler" in meta:
            plateau.load_state_dict(meta["scheduler"])
        logger.print(f"resumed from {args.continue_from_ckpt} "
                     f"at epoch {start_epoch}")

    with mesh:
        state = state.replace(
            params=shard_params(mesh, state.params),
            batch_stats=shard_params(mesh, state.batch_stats),
            opt_state=shard_params(mesh, state.opt_state))

        if args.high_aug or args.host_aug:
            tr_augment = None
            val_needs_norm = False
        else:
            from leaf_tpu.data.device_augment import (leaf_device_augment,
                                                      peak_normalize)
            tr_augment = leaf_device_augment
            val_needs_norm = True
        if args.watch_histograms:
            args.watch_model = True
        k_fuse = max(1, args.steps_per_call)
        if k_fuse > 1 and args.watch_model:
            print("note: --steps_per_call forced to 1 — "
                  "--wandb_watch_model/--watch_histograms log per-step")
            k_fuse = 1
        train_step = make_train_step(
            mode, mixup_alpha=1.0 if use_mixup else None,
            augment_fn=tr_augment, watch_norms=args.watch_model,
            watch_histograms=args.watch_histograms)
        if k_fuse > 1:
            from leaf_tpu.training import make_train_multistep
            train_multistep = make_train_multistep(
                k_fuse, mode, mixup_alpha=1.0 if use_mixup else None,
                augment_fn=tr_augment)
        eval_step = make_eval_step(mode)
        step_rng = jax.random.PRNGKey(args.random_seed + 1)

        save_hparams(args.expdir, cfg)
        if args.profile_dir:
            # trace a handful of steady-state steps (jax.profiler) — the
            # TPU-native replacement for torch-xla's debug metric dumps
            from leaf_tpu.training.loggers import profile_trace
            warm = [next(iter(train_loader)) for _ in range(1)]
            xb = shard_batch(mesh, jnp.asarray(warm[0][0]))
            yb = shard_batch(mesh, jnp.asarray(warm[0][1]))
            state, _ = train_step(state, xb, yb, step_rng)  # compile
            with profile_trace(args.profile_dir):
                for _ in range(5):
                    state, _ = train_step(state, xb, yb, step_rng)
            logger.print(f"profiler trace written to {args.profile_dir}")
        # Async host→device feed (MpDeviceLoader equivalent, reference
        # train_xla.py:195-196): upload batch N+1 while batch N computes.
        from leaf_tpu.data.loader import prefetch_to_device

        def place(batch):
            bx, by = batch
            return ("single",
                    (shard_batch(mesh, jnp.asarray(bx)),
                     shard_batch(mesh, jnp.asarray(by))))

        # --steps_per_call K > 1: feed K-stacked batches so the scan-fused
        # program runs K optimizer steps per dispatch; the epoch's trailing
        # remainder (< K batches) flows through the single-step program.
        def group_feed(it, k):
            buf = []
            for b in it:
                buf.append(b)
                if len(buf) == k:
                    yield ("multi", buf)
                    buf = []
            for b in buf:
                yield ("single", b)

        def place_any(item):
            tag, payload = item
            if tag == "single":
                return place(payload)
            xs = np.stack([np.asarray(b[0]) for b in payload])
            ys = np.stack([np.asarray(b[1]) for b in payload])
            return (tag, (shard_batch(mesh, xs, stacked=True),
                          shard_batch(mesh, ys, stacked=True)))

        def make_feed(loader_iter):
            if k_fuse == 1:
                return prefetch_to_device(loader_iter, place)
            return prefetch_to_device(group_feed(loader_iter, k_fuse),
                                      place_any)

        # Preemption safety (↑ over the reference, which has no handling —
        # SURVEY §5 "failure detection": resume was manual-only): on
        # SIGTERM (what TPU-VM maintenance/preemption delivers), finish the
        # in-flight step, checkpoint mid-epoch as epoch_{e:03d}_preempt
        # with meta epoch e-1, and exit 0 so `--continue_from_ckpt latest`
        # redoes the interrupted epoch on the next boot.
        import signal
        preempted = []

        def _on_sigterm(signum, frame):
            preempted.append(signum)

        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (e.g. driven from a test)
            pass

        best_val = -1.0
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            tracker = RateTracker()
            ep_loss = ep_correct = ep_count = None
            t0 = time.time()
            steps_done = 0
            for tag, (xb, yb) in make_feed(iter(train_loader)):
                if tag == "multi":
                    state, metrics = train_multistep(state, xb, yb, step_rng)
                    n_new = xb.shape[0]
                    loss_sum = metrics["loss"] * n_new  # multi returns mean
                    clips = xb.shape[0] * xb.shape[1]
                else:
                    state, metrics = train_step(state, xb, yb, step_rng)
                    n_new, loss_sum, clips = 1, metrics["loss"], xb.shape[0]
                prev_steps = steps_done
                steps_done += n_new
                bi = steps_done - 1  # index of the last completed step
                # accumulate ON DEVICE — no per-step host sync
                if ep_loss is None:
                    ep_loss = loss_sum
                    ep_correct = metrics["correct"]
                    ep_count = metrics["count"]
                else:
                    ep_loss = ep_loss + loss_sum
                    ep_correct = ep_correct + metrics["correct"]
                    ep_count = ep_count + metrics["count"]
                tracker.add(clips)
                # with K-fused calls, "every log_steps steps" means: did
                # this call cross a multiple-of-log_steps boundary?
                at_log = (prev_steps == 0
                          or bi // args.log_steps > (prev_steps - 1)
                          // args.log_steps)
                if at_log:
                    logger.print(
                        f"epoch {epoch} step {bi}/{steps_per_epoch} "
                        f"rate {tracker.rate():.1f} ex/s "
                        f"global {tracker.global_rate():.1f} ex/s")
                    if args.watch_model:
                        logger.log_scalars(
                            {f"watch/{k}": float(v)
                             for k, v in metrics.items() if "norm" in k},
                            step=epoch * steps_per_epoch + bi)
                    if args.watch_histograms:
                        from leaf_tpu.training.histograms import (
                            histogram_tree)
                        hists = histogram_tree(state.params,
                                               prefix="params/")
                        hists.update(histogram_tree(metrics["_grads"],
                                                    prefix="grads/"))
                        logger.log_histograms(
                            hists, step=epoch * steps_per_epoch + bi)
                stop_now = bool(preempted)
                if world > 1:
                    # SIGTERM lands on hosts at different times (or on a
                    # subset): every host must leave the SPMD loop at the
                    # SAME step or the rest deadlock in the next step's
                    # collectives / orbax barriers. Reach consensus at log
                    # boundaries — a scalar all-gather over DCN, bounded
                    # skew of log_steps steps, same steps_done (so the
                    # same rewind) on every host.
                    if at_log:
                        from jax.experimental import multihost_utils
                        stop_now = bool(multihost_utils.process_allgather(
                            np.asarray([1 if preempted else 0])).any())
                    else:
                        stop_now = False
                if stop_now:
                    sched_state = (plateau.state_dict()
                                   if plateau is not None else None)
                    # Rewind the schedule clock to the epoch boundary: the
                    # resumed run redoes this epoch from its start, so the
                    # mid-epoch steps must not advance warmupcosine/StepLR.
                    from leaf_tpu.training.state import rewind_steps
                    path = save_checkpoint(
                        args.expdir, rewind_steps(state, steps_done), epoch,
                        float(metrics["loss"]),
                        -1.0, -1.0, scheduler_state=sched_state,
                        dir_suffix="_preempt", meta_epoch=epoch - 1)
                    logger.print(
                        f"SIGTERM: checkpointed mid-epoch {epoch} step {bi} "
                        f"to {path}; resume with --continue_from_ckpt latest")
                    logger.close()
                    return best_val
            n_steps = steps_done
            if n_steps == 0:
                raise RuntimeError(
                    "train loader produced zero batches — the training "
                    "manifest has fewer items than one (per-host) batch "
                    f"with drop_last; reduce opt.batch_size or add data "
                    f"(epoch {epoch}).")
            tr_loss = float(ep_loss) / n_steps
            tr_acc = (float(ep_correct) / max(1, int(ep_count))
                      if multiclass else 0.0)

            # ------------------------------------------- BN re-calibration
            if args.bn_recalibrate > 0:
                # Freeze params, re-walk train batches to refresh the BN
                # running stats before they are used (validation below +
                # the checkpoint this epoch may save). Same device-side
                # preprocessing as the train step so the estimate sees the
                # trained input distribution.
                from leaf_tpu.training.bn_recalibrate import (
                    recalibrate_batch_stats)
                from leaf_tpu.training.steps import waveform_from_wire

                def recal_pre(key, x):
                    x = waveform_from_wire(x)
                    return tr_augment(key, x) if tr_augment else x

                def recal_batches(n):
                    done = 0
                    while done < n:
                        for bx, _ in iter(train_loader):
                            yield shard_batch(mesh, jnp.asarray(bx))
                            done += 1
                            if done >= n:
                                return

                state = recalibrate_batch_stats(
                    state, recal_batches(args.bn_recalibrate),
                    jax.random.fold_in(step_rng, 10_000 + epoch),
                    preprocess=recal_pre)
                logger.print(f"recalibrated BN stats on "
                             f"{args.bn_recalibrate} train batches")

            # --------------------------------------------------- validation
            # drop_last=False val remainders rarely divide the mesh: pad
            # each local batch to the per-process device multiple with
            # zero-weight rows (pad_batch_to_multiple) so they shard, and
            # let the weighted eval_step keep them out of every metric.
            from leaf_tpu.training.steps import pad_batch_to_multiple
            pad_mult = max(1, n_dev // world)

            def place_val(batch):
                bx, by, w = pad_batch_to_multiple(
                    np.asarray(batch[0]), np.asarray(batch[1]), pad_mult)
                return (shard_batch(mesh, jnp.asarray(bx)),
                        shard_batch(mesh, jnp.asarray(by)),
                        shard_batch(mesh, jnp.asarray(w)))

            v_loss = v_correct = v_count = 0.0
            outputs, gts = [], []
            for xb, yb, wb in prefetch_to_device(iter(val_loader),
                                                 place_val):
                if val_needs_norm:
                    # the split pipeline's val PeakNormalization, on device
                    # (int16 wire batches decode to float first)
                    from leaf_tpu.training.steps import waveform_from_wire
                    xb = peak_normalize(waveform_from_wire(xb))
                m = eval_step(state, xb, yb, wb)
                v_loss += float(m["loss"])
                v_correct += int(m["correct"])
                v_count += int(m["count"])
                if not multiclass:
                    # mAP path gathers raw outputs on the host (reference
                    # test.py:145-155 semantics). Multi-host: the batch is
                    # sharded across processes, so np.asarray would raise
                    # on non-addressable shards — all-gather to every host
                    # first (val-only, a few MB per batch over DCN).
                    if world > 1:
                        from jax.experimental import multihost_utils
                        out_np, yb_np, wb_np = (
                            np.asarray(multihost_utils.process_allgather(
                                a, tiled=True))
                            for a in (m["outputs"], yb, wb))
                    else:
                        out_np, yb_np, wb_np = (np.asarray(m["outputs"]),
                                                np.asarray(yb),
                                                np.asarray(wb))
                    keep = wb_np > 0
                    outputs.append(out_np[keep])
                    gts.append(yb_np[keep])
            val_loss = v_loss / max(1, len(val_loader))
            if multiclass:
                val_metric = v_correct / max(1, v_count)
                metric_name = "val_acc"
            else:
                from leaf_tpu.training.metrics import calculate_mAP
                val_metric = calculate_mAP(outputs, gts, mixup=use_mixup)
                metric_name = "val_mAP"

            dt = time.time() - t0
            logger.print(
                f"epoch {epoch}: tr_loss {tr_loss:.4f} tr_acc {tr_acc:.4f} "
                f"val_loss {val_loss:.4f} {metric_name} {val_metric:.4f} "
                f"({dt:.1f}s, {tracker.global_rate():.1f} ex/s)")
            if not is_master:
                # per-host epoch line (master logs via TrainLogger): the
                # metrics are global SPMD outputs, so every host MUST print
                # the same values — divergence here means a plateau-LR or
                # data-sharding bug across hosts
                print(f"epoch {epoch} [host {rank}]: "
                      f"val_loss {val_loss:.4f} {metric_name} "
                      f"{val_metric:.4f}", flush=True)
            # one monotone global-step axis for ALL scalars: wandb drops
            # any log whose step is below its high-water mark, so epoch
            # metrics must not restart at step=epoch once the per-step
            # watch/* logs have pushed the mark to epoch*steps_per_epoch
            logger.log_scalars(
                {"train/loss": tr_loss, "train/acc": tr_acc,
                 "val/loss": val_loss, f"val/{metric_name}": val_metric,
                 "train/examples_per_sec": tracker.global_rate(),
                 "epoch": epoch},
                step=(epoch + 1) * steps_per_epoch)

            sched_state = (plateau.state_dict()
                           if plateau is not None else None)
            if (epoch == args.epochs - 1 or val_metric > best_val
                    or (epoch + 1) % max(1, args.save_every) == 0):
                save_checkpoint(args.expdir, state, epoch, tr_loss, tr_acc,
                                val_metric, scheduler_state=sched_state)
            if plateau is not None:
                # place the new LR with the opt_state's replicated global
                # sharding — a plain jnp scalar lives only on this
                # process's device 0 and would demand an unsupported
                # cross-host transfer at the next jitted step
                from leaf_tpu.parallel.mesh import replicated_sharding
                new_lr = plateau.step(val_metric)
                state.opt_state.hyperparams["learning_rate"] = \
                    jax.device_put(jnp.asarray(new_lr, jnp.float32),
                                   replicated_sharding(mesh))
            best_val = max(best_val, val_metric)
        logger.print(f"done. best {metric_name}: {best_val:.4f}")
        logger.close()
        return best_val


if __name__ == "__main__":
    train(parse_args())
