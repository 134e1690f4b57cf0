"""Plan explainer CLI: print the optimized physical plan of any
registry query.

    python -m mapreduce_go_spark.explain wc [sf_dir]
    python -m mapreduce_go_spark.explain --list
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    from mapreduce_go_spark import registry
    from mapreduce_go_spark.session import get_spark

    queries = registry.all_queries()
    if not argv or argv[0] in ("--list", "-l"):
        for name in sorted(queries):
            print(name)
        return 0
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    if name not in queries:
        print(f"unknown query {name!r}; --list for names", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"explain-{name}")
    queries[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
