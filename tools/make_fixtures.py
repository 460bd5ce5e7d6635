#!/usr/bin/env python
"""Generate the deterministic domain fixtures (FIXTURES.md §A).

The reference's inputs, synthesized at reference-realistic cardinality
and seed-fixed. The reference ships 1,298 scenes with 23-93 stations
each and a 170-station dimension (BASELINE.md; config.py:34-205);
these fixtures model that shape at ~1/10 scene count so correctness
holds at a cardinality where plan bugs (skewed stations per scene,
wide GT join) would actually show:

- 8 TRAP scenes (unchanged from round 1): L5 + L8/9 happy paths, a
  5-band malformed scene (filt_band_cardinality), metadata missing
  LEVEL1_THERMAL_CONSTANTS (filt_metadata_keys), a scene with no
  metadata file (join_scene_assets drop), a station id absent from
  the dim (join_station_dim inner drop), GT rows missing for some
  (date, station) (sentinel -9999.0) and duplicated for others
  (first-match wins). Trap scenes keep small station lists so the
  hand-checkable probes in the unit tests stay hand-checkable.
- 112 GENERATED scenes: station counts uniform in [23, 93] drawn from
  the 170-station dim, mixed L5/L8/L9, dates spread 2009-2023.

PROBE SCENES: the per-pixel parity queries (map_bt_pixels,
map_cast_double, map_dn_to_radiance, aug_rot90, src_pt_tensor, ...)
restrict their OUTPUT to scenes whose acquisition day-of-month is
"03" — a predicate computable from the scene_id string identically in
Spark and DuckDB — so oracle compares stay bounded while the
full-corpus aggregates (agg_domain_grouped, domain_pipeline_summary)
still verify every pixel. The generator guarantees day-03 scenes in
BOTH sensor families (incl. the two trap 0603 scenes).

Outputs:
- fixtures/ground_truths.csv      — GT table (utc_date, station_id,
  air_temp, gt_id). gt_id makes the reference's implicit CSV file
  order explicit so first-match dedup is deterministic in a
  distributed read (data_loader.py:70 takes iloc[0] in file order).
- fixtures/stations.csv           — 170-row IMS_STATIONS mirror
  (config.py:34-205); id 99 deliberately absent (inner-join trap).
- fixtures/scene_stations/*.txt   — raw `[1, 2, 3]` station files
  (data_loader.py:15-28 format).
- fixtures/metadatas/*_MTL_metadata.json — nested, all-string-valued
  (E-notation) metadata (data_processor.py:39-51 shape).
- fixtures/scene_patches.parquet  — post-ingest nested form: one row
  per (scene_id, station_pos, station_id), bands array<array<array<int>>>.
- fixtures/scene_pixels.parquet   — fully-long pixel form (the 100 TB
  layout, SURVEY §1.7): scene_id, station_id, band, y, x, dn.
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Output dir + generated-scene count are env-overridable so the same
# generator produces BOTH the in-repo ~120-scene fixtures (default) and
# a full reference-cardinality set (8 traps + 1290 generated = 1,298
# scenes, matching BASELINE.md) for the gated full-scale validation run
# (tools/fullcard_check.py).
ROOT = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    ),
)

TRAP_SCENES = [
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

TRAP_STATION_IDS = [2, 6, 8, 10, 13, 16, 21, 28, 29, 30, 41, 42]
MISSING_FROM_DIM = 99  # appears in scene lists, absent from stations.csv

N_GEN_SCENES = int(os.environ.get("SPARK_GRAFT_FIXTURE_SCENES", "112"))
STATIONS_PER_SCENE = (23, 93)  # reference: 23-93 (BASELINE.md)
N_DIM_STATIONS = 170  # reference: 170 (config.py:34-205)


def scene_date(scene_id: str) -> str:
    tok = scene_id.split("_")[3]
    return f"{tok[:4]}-{tok[4:6]}-{tok[6:8]}"


def generated_scenes(rng: random.Random) -> list[tuple[str, int, bool, bool]]:
    """112 bulk scenes. Deterministic ids; ~1/14 get acquisition day
    03 (the probe-scene predicate), guaranteed in both sensor
    families; a handful repeat (path, row, date) neighbors to create
    same-date GT reuse."""
    scenes = []
    sensors = [("LT05", 7), ("LC08", 11), ("LC09", 11)]
    for i in range(N_GEN_SCENES):
        prefix, n_bands = sensors[i % 3]
        if i < 112:
            path = 170 + (i % 12)
            day = 3 if i % 14 == 0 else 1 + (i * 11) % 28
        else:
            # Beyond the default 112 the original (path, day) formula
            # repeats with period lcm(...)=336 → duplicate scene_ids at
            # full cardinality. Disjoint path range (1xx vs 17x) keyed
            # by i//28 with day = 1+i%28 makes every id unique while
            # leaving the first 112 (and thus the committed fixtures)
            # byte-identical. day==3 probe scenes recur every 28.
            path = 100 + (i // 28) % 70
            day = 1 + i % 28
        row = 30 + (i * 7) % 16
        year = 2009 + (i * 5) % 15
        if prefix == "LT05":
            year = min(year, 2011)  # L5 decommissioned era, keep plausible
        month = 1 + (i * 3) % 12
        proc_year = min(year + 1, 2023)
        scene_id = (
            f"{prefix}_L1TP_{path:03d}{row:03d}_{year:04d}{month:02d}{day:02d}"
            f"_{proc_year:04d}0101_02_T1"
        )
        scenes.append((scene_id, n_bands, True, True))
    return scenes


def main() -> None:
    rng = random.Random(42)
    nprng = np.random.RandomState(42)
    os.makedirs(ROOT, exist_ok=True)
    os.makedirs(f"{ROOT}/scene_stations", exist_ok=True)
    os.makedirs(f"{ROOT}/metadatas", exist_ok=True)
    for d in ("scene_stations", "metadatas"):
        for f in os.listdir(f"{ROOT}/{d}"):
            os.remove(f"{ROOT}/{d}/{f}")

    # 170-station dim; id 99 is skipped (the inner-join-drop trap) but
    # every TRAP_STATION_IDS member is present
    dim_ids = [i for i in range(2, 2 + N_DIM_STATIONS + 1) if i != MISSING_FROM_DIM]
    dim_ids = dim_ids[:N_DIM_STATIONS]
    assert set(TRAP_STATION_IDS) <= set(dim_ids)
    with open(f"{ROOT}/stations.csv", "w") as f:
        f.write("id,name,longitude,latitude,easting,northing\n")
        for sid in dim_ids:
            lon = round(34.0 + rng.random() * 2.0, 5)
            lat = round(29.5 + rng.random() * 3.5, 5)
            f.write(f"{sid},STATION_{sid},{lon},{lat},{600000 + sid * 13},{3300000 + sid * 17}\n")

    scenes = TRAP_SCENES + generated_scenes(rng)

    # per-scene station lists (reference text format), patches, pixels
    patch_rows: list[dict] = []
    px_scene: list[str] = []
    px_station: list[np.ndarray] = []
    px_band: list[np.ndarray] = []
    px_y: list[np.ndarray] = []
    px_x: list[np.ndarray] = []
    px_dn: list[np.ndarray] = []
    scene_station_map: dict[str, list[int]] = {}
    for idx, (scene_id, n_bands, _, _) in enumerate(scenes):
        if idx < len(TRAP_SCENES):
            k = rng.randint(6, 9)
            stations = sorted(rng.sample(TRAP_STATION_IDS, k))
        else:
            k = rng.randint(*STATIONS_PER_SCENE)
            stations = sorted(rng.sample(dim_ids, k))
        if rng.random() < 0.5:
            stations.append(MISSING_FROM_DIM)
        scene_station_map[scene_id] = stations
        with open(f"{ROOT}/scene_stations/{scene_id}_stations.txt", "w") as f:
            f.write("[" + ", ".join(str(s) for s in stations) + "]")
        n_st = len(stations)
        dn = nprng.randint(1, 255, size=(n_st, n_bands, 7, 7)).astype(np.int32)
        for pos, sid in enumerate(stations):
            patch_rows.append(
                {
                    "scene_id": scene_id,
                    "station_pos": pos,
                    "station_id": sid,
                    "bands": dn[pos].tolist(),
                }
            )
        # vectorized pixel-long form: (station, band, y, x) row order
        n_px = n_st * n_bands * 49
        px_scene.append(scene_id)  # one entry; expanded at assembly
        px_station.append(np.repeat(np.array(stations, dtype=np.int32), n_bands * 49))
        px_band.append(np.tile(np.repeat(np.arange(1, n_bands + 1, dtype=np.int32), 49), n_st))
        px_y.append(np.tile(np.repeat(np.arange(7, dtype=np.int32), 7), n_st * n_bands))
        px_x.append(np.tile(np.arange(7, dtype=np.int32), n_st * n_bands * 7))
        px_dn.append(dn.reshape(-1))
        assert px_station[-1].size == n_px

    scene_col = pa.chunked_array(
        [
            pa.array(
                np.repeat(np.arange(len(px_scene)), [a.size for a in px_station])
            ).cast(pa.int32())
        ]
    )
    scene_dict = pa.DictionaryArray.from_arrays(
        scene_col.combine_chunks(), pa.array(px_scene, pa.string())
    )
    pq.write_table(
        pa.table(
            {
                "scene_id": scene_dict.cast(pa.string()),
                "station_id": pa.array(np.concatenate(px_station), pa.int32()),
                "band": pa.array(np.concatenate(px_band), pa.int32()),
                "y": pa.array(np.concatenate(px_y), pa.int32()),
                "x": pa.array(np.concatenate(px_x), pa.int32()),
                "dn": pa.array(np.concatenate(px_dn), pa.int32()),
            }
        ),
        f"{ROOT}/scene_pixels.parquet",
    )

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

    # metadata JSONs — every leaf a string, E-notation like the real files
    for scene_id, n_bands, has_meta, has_thermal in scenes:
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
    seen: set[tuple[str, int]] = set()
    with open(f"{ROOT}/ground_truths.csv", "w") as f:
        f.write("utc_date,station_id,air_temp,gt_id\n")
        for scene_id, *_ in scenes:
            d = scene_date(scene_id)
            for sid in scene_station_map[scene_id]:
                if (d, sid) in seen:
                    continue  # same-date scenes share one GT row
                seen.add((d, sid))
                r = rng.random()
                if r < 0.15:
                    continue  # missing → -9999.0 sentinel downstream
                temp = round(rng.uniform(5.0, 42.0), 2)
                f.write(f"{d} 07:30:00,{sid},{temp},{gt_id}\n")
                gt_id += 1
                if r > 0.9:  # duplicate with a different temp; first wins
                    f.write(f"{d} 08:30:00,{sid},{round(temp + 5.0, 2)},{gt_id}\n")
                    gt_id += 1

    n_probe = sum(1 for s, *_ in scenes if s.split("_")[3][6:8] == "03")
    n_px_total = sum(a.size for a in px_station)
    print(f"fixtures written to {ROOT}")
    print(
        f"  scenes={len(scenes)} (probe day-03: {n_probe}) "
        f"patch_rows={len(patch_rows)} pixels={n_px_total} gt_rows={gt_id}"
    )


if __name__ == "__main__":
    main()
