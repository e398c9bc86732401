"""Build the ``--py-files`` archive for cluster submission.

``session.py``'s ``spark.executorEnv.*`` propagation (r9) ships the
ENV to executors, but a real (non-local) cluster also needs the CODE:
executors import ``oracle_cassandra_migrator_spark`` (including the
vendored pure-Python protobuf runtime that ``ensure_protobuf`` wires
up) inside Python worker processes, so the whole package must ride
``spark-submit --py-files`` as one zip on PYTHONPATH.

Usage::

    python scripts/build_submit_archive.py [OUT.zip]

Default output: ``dist/oracle_cassandra_migrator_spark.zip`` under the
repo root. The archive contains the package tree only — no tests, no
scripts, no ``__pycache__``/bytecode — and is immediately importable
standalone::

    PYTHONPATH=dist/oracle_cassandra_migrator_spark.zip \
        python -c "import oracle_cassandra_migrator_spark"

then submitted as::

    spark-submit --py-files dist/oracle_cassandra_migrator_spark.zip \
        your_driver.py

Entries are written in sorted order with a fixed timestamp, so the
same tree always produces a byte-identical archive (artifact caches
and image layers dedupe on content).
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

PKG = "oracle_cassandra_migrator_spark"
# Fixed DOS timestamp for reproducible archives (2020-01-01 00:00:00).
_STAMP = (2020, 1, 1, 0, 0, 0)


def build_archive(repo_root: pathlib.Path,
                  out_path: pathlib.Path) -> list[str]:
    """Zip ``<repo_root>/oracle_cassandra_migrator_spark`` (with the
    vendored protobuf runtime, without bytecode) into ``out_path``;
    returns the archived entry names."""
    pkg_dir = repo_root / PKG
    if not (pkg_dir / "__init__.py").is_file():
        raise SystemExit(f"package not found at {pkg_dir}")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    names = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(pkg_dir.rglob("*")):
            if path.is_dir() or "__pycache__" in path.parts:
                continue
            if path.suffix in (".pyc", ".pyo"):
                continue
            rel = path.relative_to(repo_root).as_posix()
            info = zipfile.ZipInfo(rel, date_time=_STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, path.read_bytes())
            names.append(rel)
    return names


def main(argv: list[str]) -> None:
    repo_root = pathlib.Path(__file__).resolve().parent.parent
    out = (pathlib.Path(argv[1]) if len(argv) > 1
           else repo_root / "dist" / f"{PKG}.zip")
    names = build_archive(repo_root, out)
    vendored = sum(1 for n in names if "/_vendor/" in n)
    print(f"{out}: {len(names)} files ({vendored} vendored), "
          f"{out.stat().st_size} bytes")


if __name__ == "__main__":
    main(sys.argv)
