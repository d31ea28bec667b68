"""Build ``html_parser_spark.zip`` for ``spark-submit --py-files``.

The deployment unit the north rule names: the whole engine shipped as
one zip that spark-submit distributes to the driver and every
executor's Python worker. The archive is DETERMINISTIC — entries are
sorted, timestamps zeroed, permissions fixed — so the same source tree
always produces byte-identical bytes and a cluster-side cache can key
the artifact by content hash instead of mtime.

Usage::

    python scripts/make_pyfiles.py [--out html_parser_spark.zip]

then::

    spark-submit --py-files html_parser_spark.zip scripts/run_pipeline.py ...
"""

from __future__ import annotations

import argparse
import os
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, pkg_root: str | None = None) -> int:
    """Zip the package rooted at ``pkg_root`` into ``out_path``.

    Returns the number of .py entries written. Only source files go
    in: __pycache__/bytecode are skipped (workers recompile), and the
    arcnames keep the top-level ``html_parser_spark/`` prefix so the
    zip root itself is the importable sys.path entry — exactly how
    spark-submit mounts a --py-files zip.
    """
    if pkg_root is None:
        pkg_root = os.path.join(_REPO, "html_parser_spark")
    base = os.path.dirname(os.path.abspath(pkg_root))
    sources: list[str] = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        # prune caches in-place; sort for a stable walk order
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        sources.extend(os.path.join(dirpath, f)
                       for f in sorted(filenames) if f.endswith(".py"))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sources:
            arc = os.path.relpath(src, base).replace(os.sep, "/")
            # fixed DOS epoch + 0644 -> reproducible central directory
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(src, "rb") as fh:
                zf.writestr(info, fh.read())
    return len(sources)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default=os.path.join(_REPO, "html_parser_spark.zip"))
    args = ap.parse_args()
    n = build_zip(args.out)
    print(f"wrote {args.out}: {n} source files")


if __name__ == "__main__":
    main()
