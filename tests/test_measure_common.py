"""The fresh-driver measurement harness helpers (tools/measure_common):
the sidecar stash must be exception-safe — a crashed timed pass that
left .gzi files in a sibling dir would silently turn every later
indexed measurement into a hop measurement. Pure filesystem tests, no
Spark."""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from measure_common import input_files, stash_sidecars  # noqa: E402


def _layout(tmp_path, with_gzi=True):
    d = tmp_path / "bgzf"
    d.mkdir()
    (d / "part-0.gz").write_bytes(b"gz0")
    (d / "part-1.gz").write_bytes(b"gz1")
    if with_gzi:
        (d / "part-0.gz.gzi").write_bytes(b"idx0")
        (d / "part-1.gz.gzi").write_bytes(b"idx1")
    (d / "_SUCCESS").write_text("")
    return str(d)


class TestStashSidecars:
    def test_roundtrip_hides_then_restores(self, tmp_path):
        d = _layout(tmp_path)
        with stash_sidecars(d):
            names = sorted(os.listdir(d))
            assert not any(n.endswith(".gzi") for n in names)
            assert os.path.isdir(d + ".gzi_stash")
        names = sorted(os.listdir(d))
        assert [n for n in names if n.endswith(".gzi")] == [
            "part-0.gz.gzi",
            "part-1.gz.gzi",
        ]
        assert open(os.path.join(d, "part-0.gz.gzi"), "rb").read() == b"idx0"
        assert not os.path.exists(d + ".gzi_stash")

    def test_restores_on_exception(self, tmp_path):
        d = _layout(tmp_path)
        with pytest.raises(RuntimeError, match="boom"):
            with stash_sidecars(d):
                raise RuntimeError("boom")
        assert sorted(n for n in os.listdir(d) if n.endswith(".gzi")) == [
            "part-0.gz.gzi",
            "part-1.gz.gzi",
        ]
        assert not os.path.exists(d + ".gzi_stash")

    def test_refuses_layout_without_sidecars(self, tmp_path):
        d = _layout(tmp_path, with_gzi=False)
        with pytest.raises(ValueError, match="no .gzi sidecars"):
            with stash_sidecars(d):
                pass
        # the refusal must not leave an empty stash dir behind
        assert not os.path.exists(d + ".gzi_stash")


class TestInputFiles:
    def test_skips_markers_and_dotfiles_keeps_sidecars(self, tmp_path):
        d = _layout(tmp_path)
        (tmp_path / "bgzf" / ".crc").write_text("")
        got = [os.path.basename(p) for p in input_files(d)]
        assert got == [
            "part-0.gz",
            "part-0.gz.gzi",
            "part-1.gz",
            "part-1.gz.gzi",
        ]


from measure_common import restore_and_assert_sidecars  # noqa: E402


class TestRestoreAndAssertSidecars:
    def test_complete_layout_passes(self, tmp_path):
        d = _layout(tmp_path)
        restore_and_assert_sidecars(d)  # no raise, no changes
        assert sorted(os.listdir(d)) == [
            "_SUCCESS",
            "part-0.gz",
            "part-0.gz.gzi",
            "part-1.gz",
            "part-1.gz.gzi",
        ]

    def test_restores_orphaned_stash(self, tmp_path):
        # simulate a hard kill inside stash_sidecars' window: sidecars
        # sit in the sibling stash, the published layout has none
        d = _layout(tmp_path)
        stash = d + ".gzi_stash"
        os.makedirs(stash)
        for n in ("part-0.gz.gzi", "part-1.gz.gzi"):
            os.rename(os.path.join(d, n), os.path.join(stash, n))
        restore_and_assert_sidecars(d)
        assert not os.path.exists(stash)
        assert sorted(n for n in os.listdir(d) if n.endswith(".gzi")) == [
            "part-0.gz.gzi",
            "part-1.gz.gzi",
        ]

    def test_raises_on_genuinely_missing_sidecar(self, tmp_path):
        d = _layout(tmp_path)
        os.remove(os.path.join(d, "part-1.gz.gzi"))
        with pytest.raises(RuntimeError, match="missing their .gzi"):
            restore_and_assert_sidecars(d)
