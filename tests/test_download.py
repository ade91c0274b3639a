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


def test_dataset_provenance(tmp_path):
    """Provenance records the archive hash + a structural fingerprint that
    changes when the dataset changes (reference helpers.py:275-280 logged
    the tarball + hash to comet)."""
    from fabric_tpu.data.download import dataset_provenance
    archive = _make_archive(tmp_path)
    ddir = str(tmp_path / "data")
    cfg = Config(dataset_dir=ddir, dataset_name=archive)
    resolved = ensure_dataset(cfg)
    prov = dataset_provenance(cfg, resolved)
    assert prov["dataset_name"] == archive
    assert len(prov["archive_sha256"]) == 64
    assert len(prov["fingerprint"]) == 64 and prov["n_files"] > 0
    # drift detection: touching one label changes the fingerprint
    lab = os.path.join(resolved, "labels", "alpha", "cm", "cm.png")
    with open(lab, "ab") as f:
        f.write(b"\0")
    assert dataset_provenance(cfg, resolved)["fingerprint"] != \
        prov["fingerprint"]
