#!/usr/bin/env python
"""Generate the deterministic domain fixtures (FIXTURES.md §A).

The reference's inputs, synthesized small and seed-fixed:

- fixtures/ground_truths.csv      — GT table (utc_date, station_id,
  air_temp, gt_id). gt_id makes the reference's implicit CSV file
  order explicit so first-match dedup is deterministic in a
  distributed read (data_loader.py:70 takes iloc[0] in file order).
- fixtures/stations.csv           — IMS_STATIONS mirror (config.py:34-205).
- fixtures/scene_stations/*.txt   — raw `[1, 2, 3]` station files
  (data_loader.py:15-28 format).
- fixtures/metadatas/*_MTL_metadata.json — nested, all-string-valued
  (E-notation) metadata (data_processor.py:39-51 shape).
- fixtures/scene_patches.parquet  — post-ingest nested form: one row
  per (scene_id, station_pos, station_id), bands array<array<array<int>>>.
- fixtures/scene_pixels.parquet   — fully-long pixel form (the 100 TB
  layout, SURVEY §1.7): scene_id, station_id, band, y, x, dn.

Trap coverage: L5 (7-band) + L8/9 (11-band) scenes, a 5-band malformed
scene (filt_band_cardinality), a scene with metadata missing
LEVEL1_THERMAL_CONSTANTS (filt_metadata_keys), a scene with no
metadata file at all (join_scene_assets drop), a station id absent
from the dim (join_station_dim inner drop), GT rows missing for some
(date, station) (sentinel -9999.0) and duplicated for others
(first-match wins).
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

SCENES = [
    # (scene_id, n_bands, has_metadata, has_thermal)
    ("LT05_L1TP_174038_20100715_20200823_02_T1", 7, True, True),
    ("LT05_L1TP_175038_20101007_20200823_02_T1", 7, True, True),
    ("LC08_L1TP_174038_20190603_20200828_02_T1", 11, True, True),
    ("LC08_L1TP_175037_20140628_20200912_02_T1", 11, True, True),
    ("LC09_L1TP_174038_20220603_20230401_02_T1", 11, True, True),
    ("LC08_L1TP_176039_20150101_20200910_02_T1", 11, True, False),  # no thermal
    ("LT05_L1TP_177040_20090101_20200823_02_T1", 5, True, True),  # malformed bands
    ("LC08_L1TP_178041_20160101_20200901_02_T1", 11, False, True),  # no metadata
]

STATION_IDS = [2, 6, 8, 10, 13, 16, 21, 28, 29, 30, 41, 42]
MISSING_FROM_DIM = 99  # appears in scenes, absent from stations.csv


def scene_date(scene_id: str) -> str:
    tok = scene_id.split("_")[3]
    return f"{tok[:4]}-{tok[4:6]}-{tok[6:8]}"


def main() -> None:
    rng = random.Random(42)
    nprng = np.random.RandomState(42)
    os.makedirs(ROOT, exist_ok=True)
    os.makedirs(f"{ROOT}/scene_stations", exist_ok=True)
    os.makedirs(f"{ROOT}/metadatas", exist_ok=True)

    # stations dim (easting/northing kept as strings, per config.py)
    with open(f"{ROOT}/stations.csv", "w") as f:
        f.write("id,name,longitude,latitude,easting,northing\n")
        for sid in STATION_IDS:
            lon = round(34.0 + rng.random() * 2.0, 5)
            lat = round(29.5 + rng.random() * 3.5, 5)
            f.write(f"{sid},STATION_{sid},{lon},{lat},{600000 + sid * 13},{3300000 + sid * 17}\n")

    # per-scene station lists (reference text format), patches, pixels
    patch_rows: list[dict] = []
    pixel_cols: dict[str, list] = {k: [] for k in ("scene_id", "station_id", "band", "y", "x", "dn")}
    scene_station_map: dict[str, list[int]] = {}
    for scene_id, n_bands, _, _ in SCENES:
        k = rng.randint(6, 9)
        stations = sorted(rng.sample(STATION_IDS, k))
        if rng.random() < 0.5:
            stations.append(MISSING_FROM_DIM)
        scene_station_map[scene_id] = stations
        with open(f"{ROOT}/scene_stations/{scene_id}_stations.txt", "w") as f:
            f.write("[" + ", ".join(str(s) for s in stations) + "]")
        for pos, sid in enumerate(stations):
            dn = nprng.randint(1, 255, size=(n_bands, 7, 7)).astype(np.int32)
            patch_rows.append(
                {
                    "scene_id": scene_id,
                    "station_pos": pos,
                    "station_id": sid,
                    "bands": dn.tolist(),
                }
            )
            for b in range(n_bands):
                for y in range(7):
                    for x in range(7):
                        pixel_cols["scene_id"].append(scene_id)
                        pixel_cols["station_id"].append(sid)
                        pixel_cols["band"].append(b + 1)  # 1-based band number
                        pixel_cols["y"].append(y)
                        pixel_cols["x"].append(x)
                        pixel_cols["dn"].append(int(dn[b, y, x]))

    patch_schema = pa.schema(
        [
            ("scene_id", pa.string()),
            ("station_pos", pa.int32()),
            ("station_id", pa.int32()),
            ("bands", pa.list_(pa.list_(pa.list_(pa.int32())))),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(patch_rows, schema=patch_schema),
        f"{ROOT}/scene_patches.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "scene_id": pa.array(pixel_cols["scene_id"], pa.string()),
                "station_id": pa.array(pixel_cols["station_id"], pa.int32()),
                "band": pa.array(pixel_cols["band"], pa.int32()),
                "y": pa.array(pixel_cols["y"], pa.int32()),
                "x": pa.array(pixel_cols["x"], pa.int32()),
                "dn": pa.array(pixel_cols["dn"], pa.int32()),
            }
        ),
        f"{ROOT}/scene_pixels.parquet",
    )

    # metadata JSONs — every leaf a string, E-notation like the real files
    for scene_id, n_bands, has_meta, has_thermal in SCENES:
        if not has_meta:
            continue
        rescale = {}
        thermal_band = 6 if n_bands == 7 else 10
        for b in range(1, n_bands + 1):
            if b == thermal_band:
                # realistic thermal rescaling (e.g. L8 band 10:
                # ML=3.342E-04, AL=0.1) → radiance stays positive, so
                # ln(K1/L + 1) is defined for every DN
                rescale[f"RADIANCE_MULT_BAND_{b}"] = f"{rng.uniform(3e-4, 6e-2):.4E}"
                rescale[f"RADIANCE_ADD_BAND_{b}"] = f"{rng.uniform(0.05, 1.5):.5f}"
            else:
                rescale[f"RADIANCE_MULT_BAND_{b}"] = f"{rng.uniform(0.0003, 1.2):.4E}"
                rescale[f"RADIANCE_ADD_BAND_{b}"] = f"{rng.uniform(-65.0, 0.2):.5f}"
        doc = {"LANDSAT_METADATA_FILE": {"LEVEL1_RADIOMETRIC_RESCALING": rescale}}
        if has_thermal:
            if n_bands == 7:
                thermal = {
                    "K1_CONSTANT_BAND_6": "607.76",
                    "K2_CONSTANT_BAND_6": "1260.56",
                }
            else:
                thermal = {
                    "K1_CONSTANT_BAND_10": "774.8853",
                    "K2_CONSTANT_BAND_10": "1321.0789",
                    "K1_CONSTANT_BAND_11": "480.8883",
                    "K2_CONSTANT_BAND_11": "1201.1442",
                }
            doc["LANDSAT_METADATA_FILE"]["LEVEL1_THERMAL_CONSTANTS"] = thermal
        with open(f"{ROOT}/metadatas/{scene_id}_MTL_metadata.json", "w") as f:
            json.dump(doc, f, indent=2)

    # ground truths: rows for most (scene_date, station); ~15% missing
    # (sentinel path), ~10% duplicated (first-match path)
    gt_id = 0
    with open(f"{ROOT}/ground_truths.csv", "w") as f:
        f.write("utc_date,station_id,air_temp,gt_id\n")
        for scene_id, *_ in SCENES:
            d = scene_date(scene_id)
            for sid in scene_station_map[scene_id]:
                r = rng.random()
                if r < 0.15:
                    continue  # missing → -9999.0 sentinel downstream
                temp = round(rng.uniform(5.0, 42.0), 2)
                f.write(f"{d} 07:30:00,{sid},{temp},{gt_id}\n")
                gt_id += 1
                if r > 0.9:  # duplicate with a different temp; first wins
                    f.write(f"{d} 08:30:00,{sid},{round(temp + 5.0, 2)},{gt_id}\n")
                    gt_id += 1

    print(f"fixtures written to {ROOT}")
    print(f"  scenes={len(SCENES)} patch_rows={len(patch_rows)} pixels={len(pixel_cols['dn'])} gt_rows={gt_id}")


if __name__ == "__main__":
    main()
