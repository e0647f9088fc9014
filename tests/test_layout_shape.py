"""Build-time layout-shape assertions (VERDICT r10 item 5): a
value-oracled seam query is only as strong as its fixture's shape, so
the oracled-layout builders verify their own nontrivial shape (multiple
parts, multiple seam units per part) and raise at BUILD time — a future
fixture bug can never silently weaken an oracle again. Plus the
nonexistent-path error contract shared by all byte-skip sources
(ADVICE r10)."""

import bz2
import os

import pytest

from random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text import (
    assert_bz2_layout_shape,
    pick_ranges,
)
from random_sampling_based_approximate_mapreduce_spark.sources.byteblock_text import (
    pick_blocks,
)
from random_sampling_based_approximate_mapreduce_spark.sources.rowgroup_parquet import (
    pick_row_groups,
)
from random_sampling_based_approximate_mapreduce_spark.sources.tables import (
    assert_layout_shape,
)
from random_sampling_based_approximate_mapreduce_spark.sources.zstd_seekable_text import (
    parse_seek_table,
    write_seekable_zstd,
)


def _count_frames(p: str) -> int:
    return len(parse_seek_table(p))


class TestBgzfLayoutShape:
    """The catalog's bgzf layout counts DATA blocks only — the spec's
    EOF marker (a zero-decompressed-size member every BGZF file ends
    with) must never count as the 'second seam unit', or a
    single-data-block layout would silently pass the shape gate."""

    def _count_data_blocks(self, p: str) -> int:
        from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import scan_blocks

        return sum(1 for e in scan_blocks(p) if e.d_size)

    def test_single_data_block_part_fails(self, tmp_path):
        from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import write_bgzf

        for i in range(2):
            # whole content in ONE block: scan sees 2 members (data +
            # EOF) but only 1 seam unit
            write_bgzf(b"a\n" * 50, str(tmp_path / f"p{i}.gz"), block_bytes=4096)
        with pytest.raises(ValueError, match="seam unit"):
            assert_layout_shape(
                str(tmp_path),
                min_parts=2,
                count_units=self._count_data_blocks,
                what="bgzf t",
            )

    def test_multi_data_block_part_passes(self, tmp_path):
        from random_sampling_based_approximate_mapreduce_spark.sources.bgzf_text import write_bgzf

        for i in range(2):
            write_bgzf(b"a\n" * 500, str(tmp_path / f"p{i}.gz"), block_bytes=64)
        parts = assert_layout_shape(
            str(tmp_path),
            min_parts=2,
            count_units=self._count_data_blocks,
            what="bgzf t",
        )
        assert len(parts) == 2


class TestAssertLayoutShape:
    def test_good_multiframe_layout_passes(self, tmp_path):
        for i in range(3):
            write_seekable_zstd(
                (f"row-{i}\n" * 200).encode(),
                str(tmp_path / f"part-{i}.zst"),
                frame_bytes=64,
            )
        parts = assert_layout_shape(
            str(tmp_path), min_parts=2, count_units=_count_frames, what="t"
        )
        assert len(parts) == 3

    def test_single_part_fails(self, tmp_path):
        write_seekable_zstd(b"a\n" * 500, str(tmp_path / "only.zst"), frame_bytes=64)
        with pytest.raises(ValueError, match="non-empty part files"):
            assert_layout_shape(str(tmp_path), min_parts=2, what="t")

    def test_empty_parts_dont_count(self, tmp_path):
        write_seekable_zstd(b"a\n" * 500, str(tmp_path / "p0.zst"), frame_bytes=64)
        (tmp_path / "p1.zst").write_bytes(b"")
        with pytest.raises(ValueError, match="non-empty part files"):
            assert_layout_shape(str(tmp_path), min_parts=2, what="t")

    def test_single_frame_per_part_fails(self, tmp_path):
        """The exact r10 regression shape: enough parts, but one frame
        per file — no seam inside any file the oracle reads."""
        for i in range(2):
            write_seekable_zstd(
                b"a\n" * 100, str(tmp_path / f"p{i}.zst"), frame_bytes=1 << 20
            )
        with pytest.raises(ValueError, match="seam unit"):
            assert_layout_shape(
                str(tmp_path), min_parts=2, count_units=_count_frames, what="t"
            )

    def test_total_unit_floor(self, tmp_path):
        for i in range(2):
            write_seekable_zstd(
                b"a\n" * 300, str(tmp_path / f"p{i}.zst"), frame_bytes=64
            )
        assert_layout_shape(
            str(tmp_path), min_parts=2, count_units=_count_frames, min_units=4, what="t"
        )
        with pytest.raises(ValueError, match="seam units across"):
            assert_layout_shape(
                str(tmp_path),
                min_parts=2,
                count_units=_count_frames,
                min_units=10_000,
                what="t",
            )

    def test_marker_and_hidden_files_ignored(self, tmp_path):
        for i in range(2):
            write_seekable_zstd(
                b"a\n" * 300, str(tmp_path / f"p{i}.zst"), frame_bytes=64
            )
        (tmp_path / "_SUCCESS").write_text("")
        (tmp_path / ".p0.zst.crc").write_bytes(b"x" * 100)
        parts = assert_layout_shape(str(tmp_path), min_parts=2, what="t")
        assert all(
            not os.path.basename(p).startswith(("_", ".")) for p in parts
        ) and len(parts) == 2


class TestAssertBz2LayoutShape:
    def test_small_valid_layout_passes(self, tmp_path):
        for i in range(2):
            (tmp_path / f"p{i}.txt.bz2").write_bytes(
                bz2.compress((f"line-{i}\n" * 50).encode())
            )
        assert_bz2_layout_shape(str(tmp_path), "t")

    def test_single_part_fails(self, tmp_path):
        (tmp_path / "p0.txt.bz2").write_bytes(bz2.compress(b"x\n" * 50))
        with pytest.raises(ValueError, match="non-empty part files"):
            assert_bz2_layout_shape(str(tmp_path), "t")

    def test_large_multiblock_part_passes(self, tmp_path):
        """A realistic (non-RLE-collapsing) part spanning multiple 900k
        blocks passes — the guard counts its real block magics. Pure-run
        data would RLE below one block and rightly FAIL the guard (the
        module docstring's caveat); realistic corpora do not."""
        import random

        rnd = random.Random(5)
        big = ("".join(f"line-{rnd.random()}\n" for _ in range(110_000))).encode()
        assert len(big) >= 2 * 900_000
        (tmp_path / "p0.txt.bz2").write_bytes(bz2.compress(big, 9))
        (tmp_path / "p1.txt.bz2").write_bytes(bz2.compress(b"small\n" * 10))
        assert_bz2_layout_shape(str(tmp_path), "t")

    def test_rle_collapsed_seamless_part_fails(self, tmp_path):
        """The caveat case: >2x900k decompressed bytes of one repeated
        byte RLE-pack into a single block — no seam to cross, so the
        guard must fail the build."""
        big = b"z" * (2 * 900_000 + 10) + b"\n"
        (tmp_path / "p0.txt.bz2").write_bytes(bz2.compress(big, 9))
        (tmp_path / "p1.txt.bz2").write_bytes(bz2.compress(b"small\n" * 10))
        with pytest.raises(ValueError, match="block seam"):
            assert_bz2_layout_shape(str(tmp_path), "t")

    def test_multiblock_requirement_fires(self, tmp_path, monkeypatch):
        """Force the >= 2-blocks branch against a one-block file by
        patching the decompressed-size probe — the pure guard logic."""
        import random_sampling_based_approximate_mapreduce_spark.sources.bzip2_block_text as B

        (tmp_path / "p0.txt.bz2").write_bytes(bz2.compress(b"a\n" * 100))
        (tmp_path / "p1.txt.bz2").write_bytes(bz2.compress(b"b\n" * 100))
        real = bz2.decompress
        monkeypatch.setattr(
            B.bz2, "decompress", lambda raw: real(raw) * 20_000
        )  # claim a multi-block size
        with pytest.raises(ValueError, match="block seam"):
            assert_bz2_layout_shape(str(tmp_path), "t")


class TestNonexistentPathError:
    """All four byte-skip pickers: a bare nonexistent path fails as
    'no files', not as a confusing suffix refusal or FileNotFoundError
    (ADVICE r10)."""

    def test_byteblock(self, tmp_path):
        with pytest.raises(ValueError, match="no files under"):
            pick_blocks(str(tmp_path / "nope.txt"), 0.5)

    def test_bzip2(self, tmp_path):
        with pytest.raises(ValueError, match="no files under"):
            pick_ranges(str(tmp_path / "nope.bz2"), 0.5)

    def test_rowgroup(self, tmp_path):
        with pytest.raises(ValueError, match="no parquet files under"):
            pick_row_groups(str(tmp_path / "nope.parquet"), 0.5)
