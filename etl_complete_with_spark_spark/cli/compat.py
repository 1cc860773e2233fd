"""Reference-named entry points (SURVEY §3: the four CLI programs).

Each wrapper pins ``--source-kind``/``--mode`` and accepts the original
argument surface (carga_date.py:35-50 and siblings), delegating to the
unified ``cli.resync`` main. A user of the reference can run:

    python -m etl_complete_with_spark_spark.cli.compat carga_date \
        --namespace retail --dataset orders --connection jdbc:mysql://... \
        --db_user u --db_pass p --partition_column o_orderdate \
        --amount 500000 --lake-root s3a://lake

The reference's ``--cloud_environment`` is accepted and mapped onto the
lake root for compatibility.
"""

from __future__ import annotations

import sys

from .resync import main as resync_main

PROGRAMS = {
    # program name -> (source_kind, mode)   (SURVEY §3.1-§3.3)
    "carga_date": ("jdbc", "date"),
    "carga_int": ("jdbc", "int"),
    "mongodb_carga_date": ("mongodb", "date"),
    "mongodb_carga_int": ("mongodb", "int"),
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in PROGRAMS:
        names = ", ".join(PROGRAMS)
        print(f"usage: python -m ...cli.compat <{names}> [reference args]", file=sys.stderr)
        return 2
    program, rest = argv[0], argv[1:]
    source_kind, mode = PROGRAMS[program]

    # --cloud_environment <env> (reference arg) -> tolerated; --lake-root wins
    cleaned: list[str] = []
    skip_next = False
    for arg in rest:
        if skip_next:
            skip_next = False
            continue
        if arg == "--cloud_environment":
            skip_next = True
            continue
        cleaned.append(arg)
    return resync_main(cleaned + ["--source-kind", source_kind, "--mode", mode])


if __name__ == "__main__":
    sys.exit(main())
