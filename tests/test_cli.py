"""CLI surface parity (reference cmd_interface + console script):
argparse flags, YAML config, end-to-end .npy pipeline run."""

import json
import os

import numpy as np
import pytest

from geo_inference_spark.cli import cmd_interface, run


def test_cmd_interface_flags(tmp_path):
    args = cmd_interface(
        ["-i", "x.npy", "-cls", "3", "-ps", "16", "-v", "True",
         "-tr", "True", "-tr_e", "True", "-pr", "0.25", "-wd", str(tmp_path)]
    )
    assert args["image"] == "x.npy" and args["classes"] == 3
    assert args["patch_size"] == 16 and args["vec"] is True
    assert args["transformers"] and args["transformer_rotate"]
    assert not args["transformer_flip"]
    assert args["prediction_thr"] == 0.25


def test_cmd_interface_yaml(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "arguments:\n"
        "  image: 'r.npy'\n  model: linear:17\n  bbox: None\n"
        "  work_dir: '/tmp/x'\n  workers: 4\n  vec: True\n  yolo: False\n"
        "  coco: True\n  transformers: True\n  transformer_flip: False\n"
        "  transformer_rotate: True\n  device: cpu\n  gpu_id: 0\n"
        "  mgpu: False\n  classes: 2\n  prediction_thr: 0.3\n"
        "  patch_size: 8\n"
    )
    args = cmd_interface(["-a", str(cfg)])
    assert args["image"] == "r.npy" and args["classes"] == 2
    assert args["bbox"] is None and args["coco"] and not args["yolo"]
    assert args["patch_size"] == 8


def test_cmd_interface_requires_input():
    with pytest.raises(SystemExit):
        cmd_interface([])


def test_cli_end_to_end_npy(tmp_path, spark):
    """Full pipeline from the CLI surface on an .npy raster: mask
    tiles + GeoJSON + YOLO + COCO sinks all materialize."""
    rng = np.random.RandomState(4)
    arr = rng.uniform(0, 255, size=(2, 16, 16))
    rp = str(tmp_path / "r.npy")
    np.save(rp, arr)
    out = run(
        cmd_interface(
            ["-i", rp, "-cls", "2", "-ps", "8", "-wd", str(tmp_path / "out"),
             "-v", "True", "-y", "True", "-c", "True", "--cores", "4"]
        )
    )
    assert os.path.isdir(out["mask"])
    doc = json.load(open(out["vec"]))
    assert doc["type"] == "FeatureCollection" and doc["features"]
    coco = json.load(open(out["coco"]))
    assert coco["annotations"] and coco["images"][0]["width"] == 16
    assert os.path.isdir(out["yolo"])


def test_run_id_suffix_avoids_collisions(tmp_path, spark):
    """F13 (VERDICT r5 #9): two runs into the same work_dir get
    distinct output names; a fixed --run-id pins them."""
    rng = np.random.RandomState(4)
    arr = rng.uniform(0, 255, size=(1, 8, 8))
    rp = str(tmp_path / "r.npy")
    np.save(rp, arr)
    base = ["-i", rp, "-cls", "2", "-ps", "8", "-wd",
            str(tmp_path / "out"), "--cores", "2"]
    o1 = run(cmd_interface(base))
    o2 = run(cmd_interface(base))
    assert o1["mask"] != o2["mask"] and os.path.isdir(o1["mask"]) \
        and os.path.isdir(o2["mask"])
    o3 = run(cmd_interface(base + ["--run-id", "fixed1"]))
    assert o3["mask"].endswith("mask_tiles_fixed1.parquet")
