"""Avro <-> Spark integration on top of the pure-Python codec.

Write: the engine stages every commit as parquet (Spark-native, stats from
footers), then one distributed task per staged file transcodes parquet →
avro container. Read: mapInPandas over the file list — each task decodes
its files and yields pandas batches, so a many-file avro table scans with
full executor parallelism (per-core decode speed is Python-bound; see
avro_codec docstring).
"""

from __future__ import annotations

from ..fileio import for_path
from .avro_codec import spark_schema_to_avro


def transcode_parquet_to_avro(src_path: str, dst_path: str,
                              spark_schema) -> int:
    """Executor-side: rewrite one staged parquet file as an avro container
    with the same rows (schema-compiled columnar encoder, byte-identical
    framing to the row encoder); returns the avro file size."""
    import pyarrow.parquet as pq

    from .avro_encode import write_container_arrow
    io = for_path(src_path)
    with io.open_input(src_path) as f:
        tbl = pq.read_table(f)
    avro_schema = spark_schema_to_avro(spark_schema)
    names = [f["name"] for f in avro_schema["fields"]]
    assert set(names) == set(tbl.column_names), \
        f"schema drift: {names} vs {tbl.column_names}"
    data = write_container_arrow(tbl, avro_schema)
    out = for_path(dst_path)
    out.write_overwrite(dst_path, data)
    io.delete(src_path)
    return len(data)


def read_avro_files_df(spark, paths: list[str], read_schema):
    """Distributed avro scan: one input row per file, mapInPandas decodes
    via the schema-compiled columnar decoder (avro_decode.py) — arrow
    arrays, not dict-per-row. Yields columns in `read_schema` order;
    missing fields read as null (schema evolution handled by the caller's
    evolve() pass, same as parquet)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(read_schema)
    files_df = spark.createDataFrame([(p,) for p in paths], "path string") \
                    .repartition(min(len(paths), 512))

    def decode(batches):
        from .avro_decode import read_container_arrow
        for b in batches:
            for p in b["path"]:
                data = for_path(p).read_bytes(p)
                tbl = read_container_arrow(data, target)
                # maps_as_pydicts: Spark's pandas→arrow conversion wants
                # dicts for MapType, not arrow's list-of-tuples
                yield tbl.to_pandas(date_as_object=False,
                                    maps_as_pydicts="strict")

    return files_df.mapInPandas(decode, schema=read_schema)


def read_avro_arrow(path: str, target_arrow_schema=None):
    """One file → pyarrow Table (native datasource read path), decoded
    with the compiled columnar decoder. Types come from the container's
    own avro schema unless a target schema is given — never from
    per-chunk inference, which would drift (int32 → int64)."""
    from .avro_decode import read_container_arrow
    data = for_path(path).read_bytes(path)
    return read_container_arrow(data, target_arrow_schema)
