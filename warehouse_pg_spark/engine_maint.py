"""Maintenance commands split out of engine.py (r15): VACUUM FULL
compaction and multi-key Z-order clustering. Mixed into Engine —
see each docstring for the reference citations and the 100-TB
rationale."""

from __future__ import annotations


class MaintenanceMixin:
    def vacuum(self, name: str, target_file_mb: int = 128) -> dict[str, int]:
        """VACUUM FULL (commands/vacuum.c): compact a writable parquet
        table's small files into ~target_file_mb files and refresh its
        view. Returns {files_before, files_after, bytes}."""
        t = self._writable_by_name(name)
        if t is None:
            raise ValueError(f"not a writable parquet table: {name}")
        stats = t.compact(target_file_mb * 1024 * 1024)
        self._refresh_view(name, t)
        return stats

    def cluster_zorder(
        self, name: str, cols: tuple[str, ...], bits: int = 12,
        n_partitions: int | None = None,
    ) -> dict[str, int]:
        """Rewrite a table Z-order-clustered on `cols` (multi-dim data
        layout — the CLUSTER command's (cluster.c) distributed analogue,
        generalized to several keys the way lakehouse OPTIMIZE ZORDER
        does): scale each key to a 2^bits grid (min/max from one tiny
        agg job), interleave the grid bits into a single Morton code,
        then range-repartition + sort by it. Files then cover small
        hyper-rectangles of the key space, so parquet min/max row-group
        stats prune scans filtered on ANY of the keys — at 100 TB this
        is the difference between touching 1% and 100% of files for a
        2-predicate point query. Map-only + one range shuffle."""
        import pyspark.sql.functions as F

        t = self._writable_by_name(name)
        if t is None:
            raise KeyError(f"{name!r} is not a writable parquet table")
        df = t.read()
        stats = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        grid_cells = 1 << bits
        grids = []
        for c in cols:
            mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
            span = (mx - mn) or 1.0
            grids.append(
                F.least(
                    F.lit(grid_cells - 1),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
                        * grid_cells
                    ).cast("long"),
                )
            )
        z = F.lit(0).cast("long")
        for b in range(bits):
            for i, g in enumerate(grids):
                bit = F.shiftright(g, b).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
        parts = n_partitions or df.rdd.getNumPartitions()
        clustered = (
            df.withColumn("__z", z)
            .repartitionByRange(parts, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        t._swap_in(clustered)
        self._refresh_view(name, t)
        return {"partitions": parts, "bits": bits, "dims": len(cols)}

