#!/usr/bin/env python
"""Pack a CSV-manifest audio dataset into msgpack shards.

The reference consumes packed shards (utilities/data/packed_dataset.py:37-
176) but ships no tool to CREATE them — users needed external pipelines.
This writes the exact record layout our ``PackedDataset`` (and the
reference's) reads: one msgpack block per shard, each record
``{"audio": <raw file bytes>, "label": <manifest label>, "duration":
<samples>}``, plus a packed manifest CSV whose ``files`` column lists the
shards — drop-in for ``data.train_manifest`` with
``train.py --use_packed_dataset``.

Usage:
  python scripts/pack_dataset.py manifest.csv out_dir/ \
      [--records-per-shard 256] [--prefix train]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("manifest", help="CSV with 'files' and 'labels' columns")
    p.add_argument("out_dir")
    p.add_argument("--records-per-shard", type=int, default=256)
    p.add_argument("--prefix", type=str, default="shard")
    p.add_argument("--sample-rate", type=int, default=16000,
                   help="expected file sample rate (decode chain asserts "
                        "it; duration is stored in samples at this rate)")
    args = p.parse_args()

    import msgpack
    import pandas as pd

    from leaf_tpu.data.audio import load_audio

    df = pd.read_csv(args.manifest)
    if "files" not in df or "labels" not in df:
        raise SystemExit("manifest needs 'files' and 'labels' columns")
    os.makedirs(args.out_dir, exist_ok=True)

    shards = []
    records = []
    n_shards = 0

    def flush():
        nonlocal records, n_shards
        if not records:
            return
        path = os.path.join(args.out_dir,
                            f"{args.prefix}{n_shards:05d}.msgpack")
        with open(path, "wb") as f:
            f.write(msgpack.packb(records))
        shards.append(path)
        records = []
        n_shards += 1

    skipped = 0
    for row in df.itertuples(index=False):
        fpath, label = row.files, row.labels
        try:
            with open(fpath, "rb") as f:
                blob = f.read()
            # duration (in samples) via the same decode chain the readers
            # use; min_duration=None → no tile-padding of short clips
            wav = load_audio(fpath, args.sample_rate, min_duration=None)
        except Exception as e:  # unreadable file: skip, never half-pack
            print(f"skipping {fpath}: {e}", file=sys.stderr)
            skipped += 1
            continue
        records.append({"audio": blob, "label": str(label),
                        "duration": int(wav.shape[-1])})
        if len(records) >= args.records_per_shard:
            flush()
    flush()

    out_manifest = os.path.join(args.out_dir, f"{args.prefix}_packed.csv")
    pd.DataFrame({"files": shards}).to_csv(out_manifest, index=False)
    print(f"packed {len(df) - skipped}/{len(df)} records into "
          f"{n_shards} shards; manifest: {out_manifest}")


if __name__ == "__main__":
    main()
