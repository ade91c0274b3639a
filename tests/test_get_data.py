"""tools/get_data.py: the offline Sentinel-2 acquisition planner must match
the reference notebook's query semantics (notebooks/get_data.ipynb — per
SURVEY.md §3.5) for a fixture city list, with zero network I/O."""

import csv
import json
import os

from fabric_tpu.tools import get_data


def _safe(date, tile):
    return (f"gs://gcp-public-data-sentinel-2/tiles/32/U/LC/"
            f"S2A_MSIL1C_{date}_N0206_R008_T{tile}_{date}.SAFE")


FIXTURE = {
    "rennes": {
        "30UWU": [
            [_safe("20180611T105031", "30UWU"), "2018-06-11T10:50:31Z"],
            [_safe("20160402T105622", "30UWU"), "2016-04-02T10:56:22Z"],
            [_safe("20170715T105621", "30UWU"), "2017-07-15T10:56:21Z"],
        ],
    },
    "cupertino": {
        "10SEG": [
            [_safe("20190101T185751", "10SEG"), "2019-01-01T18:57:51Z"],
            [_safe("20160505T184422", "10SEG"), "2016-05-05T18:44:22Z"],
        ],
        "10SFG": [],  # no qualifying scenes -> dropped, like the notebook
    },
}


def test_tile_query_matches_notebook_semantics():
    sql = get_data.tile_query(48.11, -1.68)
    assert "bigquery-public-data.cloud_storage_geo_index.sentinel_2_index" in sql
    assert "north_lat > 48.11" in sql and "south_lat < 48.11" in sql
    assert "west_lon < -1.68" in sql and "east_lon > -1.68" in sql
    assert "GROUP BY mgrs_tile" in sql


def test_scene_query_matches_notebook_semantics():
    sql = get_data.scene_query("30UWU")
    assert 'cloud_cover < "1.0"' in sql
    assert 'mgrs_tile="30UWU"' in sql
    assert "total_size > 500000000" in sql


def test_change_pairs_are_first_and_last_sensing_date():
    pairs = get_data.select_change_pairs(FIXTURE)
    first, last = pairs["rennes"]["30UWU"]
    assert "20160402" in first and "20180611" in last
    assert "10SFG" not in pairs["cupertino"]  # empty tile dropped


def test_gsutil_script_dedupes():
    pairs = get_data.select_change_pairs(FIXTURE)
    # duplicate one URL across cities to exercise dedup
    pairs["copy"] = {"30UWU": list(pairs["rennes"]["30UWU"])}
    script = get_data.gsutil_script(pairs)
    lines = [ln for ln in script.splitlines() if ln.strip()]
    assert all(ln.startswith("gsutil -m cp -r gs://") for ln in lines)
    assert len(lines) == len(set(lines)) == 4  # 2 tiles x 2 dates, deduped


def test_end_to_end_plan_and_queries(tmp_path):
    out = str(tmp_path / "plan")
    meta_path = str(tmp_path / "scenes.json")
    with open(meta_path, "w") as fout:
        json.dump(FIXTURE, fout)
    cities = str(tmp_path / "cities.txt")
    with open(cities, "w") as fout:
        fout.write("rennes\ncupertino\natlantis\n")
    geocode = str(tmp_path / "geo.json")
    with open(geocode, "w") as fout:
        json.dump({"rennes": [48.11, -1.68],
                   "cupertino": [37.32, -122.03]}, fout)

    assert get_data.main(["queries", "--cities", cities,
                          "--geocode", geocode, "--out_dir", out]) == 0
    sql = open(os.path.join(out, "tile_queries.sql")).read()
    assert "-- rennes" in sql and "-- cupertino" in sql
    assert "atlantis" in open(os.path.join(out, "MISSING.txt")).read()

    assert get_data.main(["plan", "--metadata", meta_path,
                          "--out_dir", out]) == 0
    with open(os.path.join(out, "inference_metadata.json")) as fin:
        pairs = json.load(fin)
    assert set(pairs) == {"rennes", "cupertino"}
    sh = open(os.path.join(out, "download_tiles.sh")).read()
    assert sh.count("gsutil -m cp -r") == 4
    with open(os.path.join(out, "distinct_pairs.csv")) as fin:
        rows = list(csv.reader(fin))
    # [date1, safe1, date2, safe2, tile] with dates from the SAFE name
    assert rows and rows[0][0].startswith("2016")
    assert rows[0][4] in ("30UWU", "10SEG")
    with open(os.path.join(out, "inference_analysis.csv")) as fin:
        arows = list(csv.reader(fin))
    assert ["rennes", "30UWU", "20160402", "20180611"] in arows
