"""S7 model-artifact fetch (sources/artifacts.py) — mirrors the shape
of the reference's tests/utils/test_helpers.py download/extract/
get_model tests, with file:// URLs standing in for the model zoo
(VERDICT r4 #4)."""

import io
import json
import tarfile

import numpy as np
import pytest

from geo_inference_spark.sources.artifacts import (
    download_file,
    extract_tar_gz,
    get_directory,
    get_model,
)


@pytest.fixture
def model_tarball(tmp_path):
    """A zoo-style tar.gz holding a nested-path .gjmodel.json."""
    desc = json.dumps({"kind": "linear", "seed": 23, "num_classes": 4})
    path = tmp_path / "zoo" / "linear23.tar.gz"
    path.parent.mkdir()
    with tarfile.open(path, "w:gz") as tar:
        info = tarfile.TarInfo("deep/nested/dir/linear23.gjmodel.json")
        data = desc.encode()
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
        # a directory member and a symlink must be skipped
        dmember = tarfile.TarInfo("deep/nested")
        dmember.type = tarfile.DIRTYPE
        tar.addfile(dmember)
        link = tarfile.TarInfo("evil")
        link.type = tarfile.SYMTYPE
        link.linkname = "/etc/passwd"
        tar.addfile(link)
    return path


def test_get_directory_creates(tmp_path):
    d = get_directory(tmp_path / "a" / "b")
    assert d.is_dir()


def test_download_file_url(tmp_path):
    src = tmp_path / "payload.bin"
    src.write_bytes(b"model-bytes" * 1000)
    dst = tmp_path / "out.bin"
    download_file(src.as_uri(), dst)
    assert dst.read_bytes() == src.read_bytes()
    assert not dst.with_suffix(".bin.part").exists()


def test_download_missing_raises(tmp_path):
    with pytest.raises(Exception):
        download_file((tmp_path / "nope.bin").as_uri(), tmp_path / "o.bin")
    assert not (tmp_path / "o.bin").exists()


def test_extract_tar_gz_flattens_and_removes(model_tarball, tmp_path):
    target = tmp_path / "x"
    out = extract_tar_gz(model_tarball, target)
    assert [p.name for p in out] == ["linear23.gjmodel.json"]
    assert (target / "linear23.gjmodel.json").is_file()
    assert not (target / "deep").exists()  # flattened
    assert not (target / "evil").exists()  # symlink skipped
    assert not model_tarball.exists()  # archive removed


def test_get_model_local_file(tmp_path):
    f = tmp_path / "m.gjmodel.json"
    f.write_text("{}")
    assert get_model(str(f), tmp_path / "cache") == f


def test_get_model_missing_raises(tmp_path):
    with pytest.raises(ValueError, match="not found"):
        get_model(str(tmp_path / "absent.pt"), tmp_path / "cache")


def test_get_model_url_caches_and_skips_refetch(model_tarball, tmp_path):
    cache = tmp_path / "cache"
    got = get_model(model_tarball.as_uri(), cache)
    assert got.name == "linear23.gjmodel.json"
    assert json.loads(got.read_text())["seed"] == 23
    # delete the source: the cached copy must satisfy the second call
    model_tarball.unlink()
    again = get_model(model_tarball.as_uri(), cache)
    assert again == got


def test_cli_load_model_from_tarball_url_end_to_end(model_tarball, tmp_path):
    """The VERDICT done-criterion: cli._load_model fetches a local
    tarball'd linear-spec artifact and returns a model whose output
    matches the inline 'linear:23' stand-in bit-for-bit."""
    from geo_inference_spark.cli import _load_model
    from geo_inference_spark.raster.kernels import make_linear_model

    model = _load_model(
        model_tarball.as_uri(), num_classes=4, work_dir=tmp_path / "wd"
    )
    ref = make_linear_model(4, seed=23)
    x = np.random.RandomState(0).uniform(0, 255, (2, 16, 16))
    np.testing.assert_array_equal(model(x), ref(x))


def test_cli_load_model_pt_still_raises(tmp_path):
    from geo_inference_spark.cli import _load_model

    with pytest.raises(NotImplementedError, match="archives"):
        _load_model("/somewhere/model.pt", num_classes=3)
