"""Manifest-based stage checkpointing: resumable multi-stage jobs.

north_star requirement: every stage persists its output and enough
manifest state that a killed job resumes mid-stage without rescoring
completed work. The reference's analog is the keyset-paginated
resumable scan (ref: extract/Program.cs:69-79 — resume filter computed
from the last persisted row).

Design (storage-format-agnostic; parquet locally, Iceberg tables on a
real cluster — the manifest logic is identical, Iceberg adds snapshot
isolation on top):

- ``CheckpointManager(base_dir)`` owns a directory of stages.
- ``stage(name, fn)``: compute-once. The output parquet is written to a
  temp dir and atomically renamed; a manifest JSON (row count, schema,
  duration, completion flag) commits the stage. Re-running a committed
  stage just reads it back — lineage is cut, no recompute.
- ``bucketed_stage(name, bucket_ids, fn)``: partition-level resume. The
  work is split into deterministic buckets (e.g. hash ranges of the
  blocking key); each bucket commits independently into the manifest.
  A kill mid-stage loses only the in-flight bucket; rerun executes
  missing buckets only ("without rescoring completed partitions").
- per-stage metrics (rows, seconds, buckets) append to metrics.jsonl
  and are queryable as a DataFrame via ``metrics_df``.
"""

from __future__ import annotations

import json
import shutil
import time
from collections.abc import Callable, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str | Path):
        self.spark = spark
        self.base = Path(base_dir)
        self.base.mkdir(parents=True, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _dir(self, name: str) -> Path:
        return self.base / name

    def _manifest(self, name: str) -> Path:
        return self.base / f"{name}.manifest.json"

    def _read_manifest(self, name: str) -> dict | None:
        p = self._manifest(name)
        if p.exists():
            return json.loads(p.read_text())
        return None

    def _write_manifest(self, name: str, manifest: dict) -> None:
        tmp = self._manifest(name).with_suffix(".tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        tmp.replace(self._manifest(name))

    def _log_metric(self, rec: dict) -> None:
        rec = {"ts": time.time(), **rec}
        with open(self.base / "metrics.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- pinned run parameters -------------------------------------------
    def pin(self, key: str, value) -> None:
        """Record a run parameter the committed stages depend on; RAISE
        if a previous run of this workdir recorded a different value.
        Same guard class as bucketed_stage's bucketing string: resuming
        committed stages under changed semantics silently returns stale
        results built for another configuration. A pre-existing workdir
        without the pin (legacy) records it on first call."""
        p = self.base / "pins.json"
        pins = json.loads(p.read_text()) if p.exists() else {}
        sval = json.dumps(value, sort_keys=True, default=str)
        prev = pins.get(key)
        if prev is not None and prev != sval:
            raise ValueError(
                f"checkpoint workdir {self.base} was built with "
                f"{key}={prev}; this run uses {sval}. Resuming committed "
                "stages under a changed configuration silently returns "
                "stale results — use a fresh workdir"
            )
        if prev is None:
            pins[key] = sval
            tmp = p.with_suffix(".tmp")
            tmp.write_text(json.dumps(pins, indent=1))
            tmp.replace(p)

    # -- whole-stage checkpoint ----------------------------------------------
    def is_complete(self, name: str) -> bool:
        m = self._read_manifest(name)
        return bool(m and m.get("complete"))

    def stage(self, name: str, fn: Callable[[], DataFrame]) -> DataFrame:
        """Compute-once stage: runs ``fn`` only if not already committed."""
        out = self._dir(name)
        if self.is_complete(name):
            return self.spark.read.parquet(str(out))
        t0 = time.perf_counter()
        df = fn()
        tmp = self.base / f"_tmp_{name}"
        if tmp.exists():
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(str(tmp))
        if out.exists():
            shutil.rmtree(out)
        tmp.replace(out)  # atomic commit of the data dir
        persisted = self.spark.read.parquet(str(out))
        # per-partition lineage: row count per output file in one pass
        # (file name = the physical partition the rows landed in)
        from pyspark.sql import functions as F

        by_file = {
            Path(r["f"]).name: r["n"]
            for r in persisted.groupBy(F.input_file_name().alias("f"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        rows = sum(by_file.values())
        files = sorted(p.name for p in out.glob("*.parquet"))
        dur = time.perf_counter() - t0
        self._write_manifest(
            name,
            {
                "stage": name,
                "complete": True,
                "rows": rows,
                "n_files": len(files),
                "files": files,
                "rows_by_file": {f: by_file.get(f, 0) for f in files},
                "schema": persisted.schema.simpleString(),
                "seconds": round(dur, 3),
            },
        )
        self._log_metric({"stage": name, "rows": rows, "seconds": round(dur, 3)})
        return persisted

    # -- partition-level (bucketed) checkpoint --------------------------------
    def bucketed_stage(
        self,
        name: str,
        bucket_ids: Sequence[int],
        fn: Callable[[int], DataFrame],
        bucketing: str | None = None,
    ) -> DataFrame:
        """Resume-mid-stage checkpoint: one commit per bucket.

        ``fn(bucket_id)`` computes that bucket's slice (caller guarantees
        buckets are disjoint and deterministic, e.g. pmod(hash(key), n)).
        Completed buckets are never recomputed on rerun.

        ``bucketing`` describes the bucketing FUNCTION (e.g.
        "pmod(xxhash64(id_a,id_b), 16)") and is recorded in the
        manifest on first run; a resume whose ``bucketing`` differs
        raises instead of silently mixing incompatible slices — a
        16-bucket run resumed with 8 buckets would skip "done" buckets
        whose old slices do not cover the new ones (lost rows), and the
        reverse would double-cover (duplicated rows).
        """
        out = self._dir(name)
        out.mkdir(parents=True, exist_ok=True)
        m = self._read_manifest(name) or {
            "stage": name, "complete": False, "buckets_done": [], "rows_by_bucket": {},
        }
        if bucketing is not None:
            prev = m.get("bucketing")
            if prev is None:
                m["bucketing"] = bucketing
                # persist NOW, not just when a bucket runs: resuming an
                # already-complete legacy checkpoint would otherwise record
                # the bucketing in memory only and the guard never arms
                self._write_manifest(name, m)
            elif prev != bucketing:
                raise ValueError(
                    f"bucketed stage {name!r} was checkpointed with "
                    f"bucketing={prev!r} but is being resumed with "
                    f"bucketing={bucketing!r}; resume with the original "
                    f"bucketing or clear {self._dir(name)} to recompute"
                )
        done = set(m["buckets_done"])
        for b in bucket_ids:
            if b in done:
                continue
            t0 = time.perf_counter()
            df = fn(b)
            bdir = out / f"bucket={b}"
            tmp = out / f"_tmp_bucket_{b}"
            if tmp.exists():
                shutil.rmtree(tmp)
            df.write.mode("overwrite").parquet(str(tmp))
            if bdir.exists():
                shutil.rmtree(bdir)
            tmp.replace(bdir)
            rows = self.spark.read.parquet(str(bdir)).count()
            dur = time.perf_counter() - t0
            m["buckets_done"] = sorted(done | {b})
            m["rows_by_bucket"][str(b)] = rows
            done.add(b)
            self._write_manifest(name, m)  # commit after EVERY bucket
            self._log_metric(
                {"stage": name, "bucket": b, "rows": rows, "seconds": round(dur, 3)}
            )
        # 'complete' is relative to the most recently requested bucket set
        # (a killed run can't know the full universe it never saw).
        complete = set(bucket_ids) <= done
        if m.get("complete") != complete:
            m["complete"] = complete
            self._write_manifest(name, m)
        # return the REQUESTED buckets (all done by this point), not
        # every historically-done bucket — a subset request must yield
        # only that subset's rows
        return self.spark.read.option("basePath", str(out)).parquet(
            *[str(out / f"bucket={b}") for b in sorted(set(bucket_ids))]
        )

    # one explicit schema for BOTH the empty-dir fallback and the populated
    # read: inference on a populated file would otherwise yield a different
    # column order/type set (and drop `bucket`, which bucketed stages log)
    METRICS_SCHEMA = "ts double, stage string, bucket long, rows long, seconds double"

    def metrics_df(self) -> DataFrame:
        p = self.base / "metrics.jsonl"
        if not p.exists():  # nothing logged yet (fresh dir / cache-hit runs)
            return self.spark.createDataFrame([], self.METRICS_SCHEMA)
        return self.spark.read.schema(self.METRICS_SCHEMA).json(str(p))
