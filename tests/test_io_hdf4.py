"""HDF4 MAIAC reader tests against a stubbed ``pyhdf`` (VERDICT round-1 #5).

No pyhdf/HDF4 stack exists in this environment, so a minimal fake
``pyhdf.SD`` module is injected into ``sys.modules`` and every semantic
branch of ``read_maiac_hdf4`` (reference ``tools.py:67-130``) actually
executes: orbit-timestamp parsing, the >4-timestamps→first-"A" rule, the
×0.001 scale, negative→−999 nulls, and the StructMetadata.0 corner grid.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from plumekit.geo.sinusoidal import grid_from_extent, sinusoidal_to_wgs84
from plumekit.io.granule import NULL_VALUE, load_granule, read_maiac_hdf4

H, W = 6, 5

# real MCD19A2 metadata shape: corners of sinusoidal tile h11v09-ish
X0, Y0 = -7783653.637667, -1111950.519667
X1, Y1 = -6671703.118000, -2223901.039333

STRUCT_META = f"""GROUP=GridStructure
\tGROUP=GRID_1
\t\tGridName="grid1km"
\t\tUpperLeftPointMtrs=({X0:.6f},{Y0:.6f})
\t\tLowerRightMtrs=({X1:.6f},{Y1:.6f})
\tEND_GROUP=GRID_1
END_GROUP=GridStructure"""


class _FakeSDS:
    """Indexable stand-in for an SDS: [i, :, :] → int16 layer slice."""

    def __init__(self, data: np.ndarray):
        self._data = data

    def __getitem__(self, key):
        return self._data[key].copy()


class _FakeSD:
    """pyhdf.SD.SD stand-in. Layer i holds raw value (i+1)*100 (so the
    ×0.001 scale is observable) with one HDF fill (−28672) at [0, 0]."""

    timestamps = ""  # set per-test via the fixture

    def __init__(self, path, mode):
        self.path = path
        self.mode = mode
        n = len([t for t in _FakeSD.timestamps.split(" ") if t])
        data = np.stack(
            [np.full((H, W), (i + 1) * 100, np.int16) for i in range(n)]
        )
        data[:, 0, 0] = -28672
        self._sds = {"Optical_Depth_055": _FakeSDS(data)}

    def attributes(self, full=1):
        assert full == 1  # reference calls attributes(full=1), tools.py:73
        return {
            "Orbit_time_stamp": (_FakeSD.timestamps, 0, 0, 0),
            "StructMetadata.0": (STRUCT_META, 0, 0, 0),
        }

    def select(self, name):
        return self._sds[name]


@pytest.fixture
def fake_pyhdf(monkeypatch):
    """Install fake ``pyhdf`` + ``pyhdf.SD`` modules; yields a setter for the
    granule's Orbit_time_stamp attribute string."""
    sd_mod = types.ModuleType("pyhdf.SD")
    sd_mod.SD = _FakeSD
    sd_mod.SDC = types.SimpleNamespace(READ=1)
    pkg = types.ModuleType("pyhdf")
    pkg.SD = sd_mod
    monkeypatch.setitem(sys.modules, "pyhdf", pkg)
    monkeypatch.setitem(sys.modules, "pyhdf.SD", sd_mod)

    def set_timestamps(ts: str):
        _FakeSD.timestamps = ts

    yield set_timestamps
    _FakeSD.timestamps = ""


def test_two_orbits_scale_null_and_grid(fake_pyhdf):
    # two orbits (≤4: both kept), double-space split noise like real attrs
    fake_pyhdf("20172301915T  20172302054A ")
    g = read_maiac_hdf4("fake_granule.hdf")

    # 11-digit+letter keys extracted by the regex (tools.py:87)
    assert list(g.layers) == ["20172301915T", "20172302054A"]
    a0 = g.layers["20172301915T"]
    a1 = g.layers["20172302054A"]
    assert a0.shape == (H, W)
    # ×0.001 scale (tools.py:89)
    assert a0[1, 1] == pytest.approx(0.1)
    assert a1[1, 1] == pytest.approx(0.2)
    # negatives → −999 AFTER scaling (tools.py:90)
    assert a0[0, 0] == NULL_VALUE and a1[0, 0] == NULL_VALUE

    # grid: same edge convention as the reference's linspace construction
    lat_ref, lon_ref = grid_from_extent(X0, Y0, X1, Y1, H, W)
    np.testing.assert_allclose(g.lat, lat_ref)
    np.testing.assert_allclose(g.lon, lon_ref)
    # [0,0] is exactly the UL corner unprojected
    lon00, lat00 = sinusoidal_to_wgs84(X0, Y0)
    assert g.lat[0, 0] == pytest.approx(lat00)
    assert g.lon[0, 0] == pytest.approx(lon00)


def test_more_than_four_orbits_keeps_first_aqua(fake_pyhdf):
    # 5 orbits: rule fires; first 'A' is the 3rd timestamp. The reference
    # then reads *layer 0* for it (enumerate over the filtered list,
    # tools.py:83-88) — quirk preserved deliberately.
    fake_pyhdf(
        "20172300010T 20172300150T 20172300330A 20172300510T 20172300650A"
    )
    g = read_maiac_hdf4("fake_granule.hdf")
    assert list(g.layers) == ["20172300330A"]
    assert g.layers["20172300330A"][1, 1] == pytest.approx(0.1)  # layer 0


def test_correct_orbit_layer_reads_the_aqua_layer(fake_pyhdf):
    # compat flag off the quirk: the Aqua timestamp gets ITS layer (index
    # 2), not layer 0 — the intended behavior (same compat-flag pattern as
    # CompatFlags.pick_larger_mask)
    fake_pyhdf(
        "20172300010T 20172300150T 20172300330A 20172300510T 20172300650A"
    )
    g = read_maiac_hdf4("fake_granule.hdf", correct_orbit_layer=True)
    assert list(g.layers) == ["20172300330A"]
    assert g.layers["20172300330A"][1, 1] == pytest.approx(0.3)  # layer 2


def test_rule_disabled_keeps_all_layers(fake_pyhdf):
    fake_pyhdf(
        "20172300010T 20172300150T 20172300330A 20172300510T 20172300650A"
    )
    g = read_maiac_hdf4("fake_granule.hdf", max_layers_rule=False)
    assert len(g.layers) == 5
    # layer i ↔ timestamp i when the rule is off
    assert g.layers["20172300650A"][1, 1] == pytest.approx(0.5)


def test_load_granule_dispatches_hdf(fake_pyhdf):
    fake_pyhdf("20172301915T")
    g = load_granule("scene_T.hdf")
    assert g.name == "scene_T"
    assert list(g.layers) == ["20172301915T"]
