"""Dataset acquisition tests (reference download_dataset equivalent)."""

import os
import tarfile

import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.download import ensure_dataset, fetch, extract
from fabric_tpu.data.synthetic import generate_synthetic_dataset


def _make_archive(tmp_path):
    src = tmp_path / "src"
    cfg = Config(dataset_dir=str(src))
    generate_synthetic_dataset(str(src), cfg, cities=["alpha"],
                               sizes=[(40, 40)])
    archive = str(tmp_path / "onera_w_mask.tar.gz")
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(str(src / "images"), arcname="images")
        tf.add(str(src / "labels"), arcname="labels")
    return archive


def test_ensure_dataset_existing_dir(tmp_path):
    cfg = Config(dataset_dir=str(tmp_path))
    generate_synthetic_dataset(str(tmp_path), cfg, cities=["a"],
                               sizes=[(40, 40)])
    assert ensure_dataset(cfg) == str(tmp_path)


def test_ensure_dataset_extracts_archive(tmp_path):
    archive = _make_archive(tmp_path)
    cfg = Config(dataset_dir=str(tmp_path / "data"), dataset_name=archive)
    ddir = ensure_dataset(cfg)
    assert os.path.isdir(os.path.join(ddir, "labels", "alpha"))


def test_ensure_dataset_nested_archive(tmp_path):
    src = tmp_path / "src"
    cfg0 = Config(dataset_dir=str(src))
    generate_synthetic_dataset(str(src), cfg0, cities=["alpha"],
                               sizes=[(40, 40)])
    archive = str(tmp_path / "nested.tar.gz")
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(str(src), arcname="onera")
    cfg = Config(dataset_dir=str(tmp_path / "data2"), dataset_name=archive)
    ddir = ensure_dataset(cfg)
    assert ddir.endswith("onera")
    assert os.path.isdir(os.path.join(ddir, "labels", "alpha"))


def test_fetch_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        fetch("/does/not/exist.tar.gz", str(tmp_path))


def test_fetch_file_uri(tmp_path):
    archive = _make_archive(tmp_path)
    assert fetch("file://" + archive, str(tmp_path)) == archive
