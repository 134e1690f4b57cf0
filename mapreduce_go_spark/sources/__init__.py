"""Sources & sinks (SURVEY §1.2 mapping).

The reference's only source is whole text files on a shared
filesystem, and its only sink is "%v %v" text shards
(/root/reference/mr/worker.go:92-98,104-109). Here: parquet is the
default columnar path (tables.py), runner.corpus_from_dir covers the
whole-text-file shape, and this module rounds out the splittable
formats (csv/json/orc) with schema-explicit readers — inferSchema is
a full extra pass at 100 TB and is never used.
"""

from mapreduce_go_spark.sources.io import (read_csv, read_json, read_orc,
                                           write_csv, write_json, write_orc,
                                           write_parquet, write_text_kv)

__all__ = [
    "read_csv", "read_json", "read_orc",
    "write_csv", "write_json", "write_orc",
    "write_parquet", "write_text_kv",
]
