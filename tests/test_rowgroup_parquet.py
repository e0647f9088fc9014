"""Row-group-level parquet sampling (sources/rowgroup_parquet.py).

The reference's skip-without-materialize (RandomizedXMLRecordReader.java:
117-123) transplanted to the engine's columnar format: unpicked row
groups are never read. Speedup evidence lives in docs/SCALE.md (measured
on a 1.9 GB single file); these tests pin semantics.
"""

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from random_sampling_based_approximate_mapreduce_spark.sources.rowgroup_parquet import (
    pick_row_groups,
    read_parquet_rowgroup_pruned,
    read_parquet_rowgroup_sampled,
    rowgroup_id_ranges,
)


@pytest.fixture(scope="module")
def multi_rg_file(tmp_path_factory, sf_dir):
    """documents testdata rewritten as ONE file with many small row groups,
    sorted by doc_id (so footer min/max ranges are disjoint)."""
    out = str(tmp_path_factory.mktemp("rg") / "docs_multi_rg.parquet")
    t = (
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id")
        .arrow()
    )
    pq.write_table(t, out, row_group_size=40)
    return out


class TestPick:
    def test_deterministic_and_exact_counts(self, multi_rg_file):
        p1, rows1, total1 = pick_row_groups(multi_rg_file, 0.3, seed=7)
        p2, rows2, total2 = pick_row_groups(multi_rg_file, 0.3, seed=7)
        assert (p1, rows1, total1) == (p2, rows2, total2)
        assert 0 < rows1 < total1
        assert total1 == pq.ParquetFile(multi_rg_file).metadata.num_rows

    def test_never_empty(self, multi_rg_file):
        picked, rows, _ = pick_row_groups(multi_rg_file, 1e-9, seed=1)
        assert len(picked) == 1 and rows > 0

    def test_bad_ratio_rejected(self, multi_rg_file):
        with pytest.raises(ValueError):
            pick_row_groups(multi_rg_file, 0.0)


class TestReaders:
    def test_pysource_reads_exactly_the_picked_rows(self, spark, multi_rg_file):
        picked, picked_rows, total = pick_row_groups(multi_rg_file, 0.3)
        sf = read_parquet_rowgroup_sampled(spark, multi_rg_file, 0.3)
        assert sf.df.count() == picked_rows
        assert abs(sf.ratio - picked_rows / total) < 1e-12

    def test_pruned_equals_pysource_rowset(self, spark, multi_rg_file):
        """The stats-pruned JVM path and the direct pyarrow path read the
        SAME sample (same hash pick), row for row."""
        via_src = {
            r["doc_id"]
            for r in read_parquet_rowgroup_sampled(spark, multi_rg_file, 0.3).df.collect()
        }
        via_prune = {
            r["doc_id"]
            for r in read_parquet_rowgroup_pruned(
                spark, multi_rg_file, 0.3, "doc_id"
            ).df.collect()
        }
        assert via_src == via_prune
        assert len(via_src) > 0

    def test_pruned_filter_reaches_the_scan(self, spark, multi_rg_file):
        # The hash pick keys on the FILE PATH (stable across runs for a
        # fixed path), but pytest's tmp path differs per run, so the
        # picked set varies here: multiple disjoint ranges push as
        # Or(...)/And(...), while a single contiguous range pushes as two
        # bare bound conjuncts with no wrapper. Assert the shape that
        # matches the ranges actually picked — both are fully pushed.
        sf = read_parquet_rowgroup_pruned(spark, multi_rg_file, 0.3, "doc_id")
        plan = sf.df._jdf.queryExecution().executedPlan().toString()
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "doc_id" in pushed, plan  # a non-empty doc_id filter reached the scan
        ranges, _, _ = rowgroup_id_ranges(multi_rg_file, 0.3, "doc_id")
        if len(ranges) > 1:
            assert "Or(" in pushed or "And(" in pushed, pushed
        else:
            assert "GreaterThanOrEqual(doc_id" in pushed or "And(" in pushed, pushed

    def test_ht_estimate_unbiased_on_uniform_ids(self, spark, multi_rg_file):
        """approx_count scales by the EXACT achieved ratio, so estimating
        the table's total from the sample is exact arithmetic."""
        _, picked_rows, total = pick_row_groups(multi_rg_file, 0.3)
        sf = read_parquet_rowgroup_sampled(spark, multi_rg_file, 0.3)
        est = sf.approx_count(alias="est").collect()[0]["est"]
        assert est == pytest.approx(total, rel=1e-9)

    def test_band_picking_merges_contiguous_ranges(self, spark, multi_rg_file):
        """band_size>1 keeps the predicate small: arm count == picked
        bands, each arm covering band_size contiguous row groups; the
        rowset is still exactly the picked groups' rows."""
        n_rgs = pq.ParquetFile(multi_rg_file).metadata.num_row_groups
        assert n_rgs >= 6  # need multiple bands for the test to mean anything
        ranges, picked_rows, total = rowgroup_id_ranges(
            multi_rg_file, 0.5, "doc_id", band_size=3
        )
        assert 0 < picked_rows <= total
        assert len(ranges) <= (n_rgs + 2) // 3
        sf = read_parquet_rowgroup_pruned(
            spark, multi_rg_file, 0.5, "doc_id", band_size=3
        )
        assert sf.df.count() == picked_rows
        assert abs(sf.ratio - picked_rows / total) < 1e-12
        # each merged arm spans a contiguous id range: the filtered rowset
        # equals the union of the BETWEEN arms evaluated locally
        ids = {r["doc_id"] for r in sf.df.select("doc_id").collect()}
        expect = {
            r["doc_id"]
            for r in spark.read.parquet(multi_rg_file).select("doc_id").collect()
            if any(lo <= r["doc_id"] <= hi for lo, hi in ranges)
        }
        assert ids == expect

    def test_two_stage_rowgroup_then_bernoulli(self, spark, multi_rg_file):
        """row_config composes a within-group Bernoulli stage; the
        SampledFrame ratio is the exact product and the HT estimate of
        the table total stays unbiased-by-construction in expectation
        (here: just check ratio bookkeeping and row containment)."""
        from random_sampling_based_approximate_mapreduce_spark.sampling.config import SamplingConfig

        base = read_parquet_rowgroup_sampled(spark, multi_rg_file, 0.5, seed=7)
        two = read_parquet_rowgroup_sampled(
            spark, multi_rg_file, 0.5, seed=7, row_config=SamplingConfig(ratio=0.5, seed=11)
        )
        assert two.ratio == pytest.approx(base.ratio * 0.5)
        base_ids = {r["doc_id"] for r in base.df.select("doc_id").collect()}
        two_ids = {r["doc_id"] for r in two.df.select("doc_id").collect()}
        assert two_ids <= base_ids
        assert 0 < len(two_ids) < len(base_ids)
        # pruned path composes identically
        two_pruned = read_parquet_rowgroup_pruned(
            spark, multi_rg_file, 0.5, "doc_id", seed=7,
            row_config=SamplingConfig(ratio=0.5, seed=11),
        )
        assert two_pruned.ratio == pytest.approx(two.ratio)

    def test_overlapping_ranges_rejected(self, spark, tmp_path, sf_dir):
        """Unsorted data -> overlapping row-group id ranges -> pruned
        sampling must refuse rather than silently return a wrong sample."""
        out = str(tmp_path / "unsorted.parquet")
        t = (
            duckdb.connect()
            .execute(
                f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
                "ORDER BY md5(doc_id::VARCHAR)"
            )
            .arrow()
        )
        pq.write_table(t, out, row_group_size=40)
        with pytest.raises(ValueError, match="overlap"):
            rowgroup_id_ranges(out, 0.3, "doc_id")
