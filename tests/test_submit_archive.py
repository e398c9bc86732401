"""Cluster-submit packaging (VERDICT r9 item 8): the --py-files zip
must import standalone (without the repo checkout on the path),
carry the vendored protobuf runtime, exclude bytecode, and build
byte-identically from the same tree."""

import pathlib
import subprocess
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from build_submit_archive import build_archive  # noqa: E402


def test_archive_imports_standalone(tmp_path):
    out = tmp_path / "pkg.zip"
    names = build_archive(REPO, out)
    assert "oracle_cassandra_migrator_spark/__init__.py" in names
    assert any("/_vendor/protobuf_runtime/" in n for n in names)
    assert not any("__pycache__" in n or n.endswith(".pyc")
                   for n in names)
    assert not any(n.startswith(("tests/", "scripts/")) for n in names)

    # import from the ZIP ONLY: strip the checkout from the child's
    # path so zipimport (what a remote executor does with --py-files)
    # is the code path under test
    probe = (
        "import sys;"
        f"sys.path = [p for p in sys.path if p not in ('', {str(REPO)!r})];"
        "import oracle_cassandra_migrator_spark as pkg;"
        "assert 'pkg.zip' in pkg.__file__, pkg.__file__;"
        "from oracle_cassandra_migrator_spark._vendor import ensure_protobuf;"
        "assert ensure_protobuf();"
        "import google.protobuf;"
        "print(google.protobuf.__version__)"
    )
    got = subprocess.run(
        [sys.executable, "-c", probe],
        env={"PYTHONPATH": str(out), "PATH": "/usr/bin:/bin"},
        capture_output=True, text=True, timeout=120)
    assert got.returncode == 0, got.stderr
    assert got.stdout.strip().startswith("6.")


def test_archive_is_reproducible(tmp_path):
    a, b = tmp_path / "a.zip", tmp_path / "b.zip"
    build_archive(REPO, a)
    build_archive(REPO, b)
    assert a.read_bytes() == b.read_bytes()
    # sorted entry order inside the archive (stable listings)
    with zipfile.ZipFile(a) as zf:
        names = zf.namelist()
    assert names == sorted(names)
