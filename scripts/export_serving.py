#!/usr/bin/env python
"""Export a trained experiment as a serving artifact.

Loads the best (or given) checkpoint of an expdir and writes
weight-embedded AOT artifacts + manifest via leaf_tpu.serving
(the deployment flow the reference lacks — its README's answer is
"load the checkpoint into torch", reference README.md:94-114).

Example:
  python scripts/export_serving.py --exp_dir ./exp_scv2_b0 \
      --out_dir ./exp_scv2_b0/serving --batch_sizes 8,64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, default=None,
                   help="default: <exp_dir>/serving")
    p.add_argument("--ckpt", type=str, default=None,
                   help="explicit checkpoint dir (default: best by val_acc)")
    p.add_argument("--batch_sizes", type=str, default="8,64",
               help="buckets; no b=1 by default — a padded batch of 8 costs\n               less device time than a single clip (BASELINE.md serving table)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list, e.g. 'cpu,tpu' for a portable artifact"
                        " (default: current backend)")
    p.add_argument("--streaming_chunk", type=int, default=0,
                   help="also export streaming-frontend artifacts for this "
                        "chunk size (samples; multiple of the hop, LEAF "
                        "min 640); 0 = off")
    p.add_argument("--streaming_streams", type=int, default=8,
                   help="concurrent streams per replica for the streaming "
                        "artifact (its fixed batch)")
    p.add_argument("--platform", type=str, default=None,
                   help="force the jax platform before first use")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from leaf_tpu.models import Classifier
    from leaf_tpu.serving import save_exported
    from leaf_tpu.training import TrainState
    from leaf_tpu.training.checkpoint import (best_checkpoint,
                                              load_checkpoint, load_hparams)

    cfg = load_hparams(args.exp_dir)
    ckpt = args.ckpt or best_checkpoint(args.exp_dir)
    assert ckpt, f"no checkpoint found under {args.exp_dir}"

    sr = int(cfg["audio_config"]["sample_rate"])
    model = Classifier(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, sr), jnp.float32), train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=optax.identity())
    state, meta = load_checkpoint(ckpt, state, with_opt=False)
    print(f"loaded {ckpt} (val metric {meta.get('val_acc', 'n/a')})")

    out = args.out_dir or os.path.join(args.exp_dir, "serving")
    manifest = save_exported(
        out, cfg,
        {"params": state.params, "batch_stats": state.batch_stats},
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        platforms=args.platforms.split(",") if args.platforms else None)
    print(f"exported {manifest['files']} to {out}")

    if args.streaming_chunk:
        from leaf_tpu.frontend import get_frontend
        from leaf_tpu.serving import save_exported_streaming

        leaf = get_frontend(cfg)
        smanifest = save_exported_streaming(
            out, leaf, {"params": state.params["features"]},
            chunk_size=args.streaming_chunk,
            n_streams=args.streaming_streams,
            platforms=args.platforms.split(",") if args.platforms else None)
        print(f"exported streaming {smanifest['files']} to {out} "
              f"(chunk {args.streaming_chunk}, "
              f"{args.streaming_streams} streams)")


if __name__ == "__main__":
    main()
