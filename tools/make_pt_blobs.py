#!/usr/bin/env python
"""Generate fixtures/pt_blobs/*.pt — binary tensor blobs DERIVED FROM
fixtures/scene_patches.parquet, so the .pt ingest query (src_pt_tensor)
gets a full DuckDB oracle against scene_pixels.parquet.

Blob format (the torch-free stand-in; real .pt files are a pickle the
injectable decoder in sources/landsat.py would replace):
  int32[4] header  = (n_bands, n_stations, 7, 7)
  int32[...] data  = tensor in the ON-DISK layout (bands, stations, 7, 7)
                     — the layout torch.load returns BEFORE the
                     reference's permute(1,0,2,3) (data_loader.py:131-132)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

ROOT = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    ),
)


def main() -> None:
    out_dir = os.path.join(ROOT, "pt_blobs")
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(os.path.join(ROOT, "scene_patches.parquet")).to_pylist()
    by_scene: dict[str, list] = {}
    for row in tbl:
        by_scene.setdefault(row["scene_id"], []).append(row)
    for scene_id, rows in sorted(by_scene.items()):
        rows.sort(key=lambda r: r["station_pos"])
        stations = np.array([r["bands"] for r in rows], dtype=np.int32)
        # (stations, bands, 7, 7) → on-disk (bands, stations, 7, 7)
        disk = stations.transpose(1, 0, 2, 3)
        header = np.array(disk.shape, dtype=np.int32)
        with open(os.path.join(out_dir, f"{scene_id}.pt"), "wb") as f:
            f.write(header.tobytes())
            f.write(disk.tobytes())
        print(scene_id, disk.shape)


if __name__ == "__main__":
    main()
