"""Real-data contract hardening (VERDICT round-3 missing #1 / next #7):
structural fuzzing of the HDF4 reader's input surface and antimeridian /
zone-boundary exercises of the UTM resampler — the failure modes real
MCD19A2 / IVAOT granules can present that synthetic fixtures never do.
The register of what real data could still break lives in
docs/parity.md ("real-data contract register")."""

from __future__ import annotations

import numpy as np
import pytest

from plumekit.geo.utm import UTMProjection, UTMResampler, utm_zone_of
from plumekit.io.granule import read_maiac_hdf4

from tests.test_io_hdf4 import fake_pyhdf, _FakeSD  # noqa: F401 (fixture)


# ---------------------------------------------------------------------------
# HDF4 structural fuzz (stubbed pyhdf)
# ---------------------------------------------------------------------------

def test_malformed_timestamp_fails_with_filename(fake_pyhdf):  # noqa: F811
    fake_pyhdf("GARBAGE")
    with pytest.raises(ValueError, match="malformed orbit timestamp"):
        read_maiac_hdf4("weird.hdf")


def test_empty_timestamp_attribute(fake_pyhdf):  # noqa: F811
    fake_pyhdf("   ")
    # zero orbits → zero layers → the loud no-layer error, not IndexError
    with pytest.raises((ValueError, StopIteration)):
        read_maiac_hdf4("empty.hdf")


def test_five_terra_orbits_no_aqua(fake_pyhdf):  # noqa: F811
    """>4 orbits, none Aqua (a Terra-only high-latitude tile): the
    reference's filter would IndexError; plumekit names the rule."""
    fake_pyhdf("20172300010T 20172300150T 20172300330T "
               "20172300510T 20172300650T")
    with pytest.raises(ValueError, match="Aqua"):
        read_maiac_hdf4("terra_only.hdf")
    # and the documented escape hatch keeps all five
    g = read_maiac_hdf4("terra_only.hdf", max_layers_rule=False)
    assert len(g.layers) == 5


def test_corrupt_struct_metadata(fake_pyhdf, monkeypatch):  # noqa: F811
    fake_pyhdf("20172302054A")

    def bad_attrs(self, full=1):
        return {
            "Orbit_time_stamp": ("20172302054A", 0, 0, 0),
            "StructMetadata.0": ("GROUP=GridStructure END_GROUP", 0, 0, 0),
        }

    monkeypatch.setattr(_FakeSD, "attributes", bad_attrs)
    with pytest.raises(ValueError, match="StructMetadata"):
        read_maiac_hdf4("corrupt_meta.hdf")


def test_many_orbit_granule(fake_pyhdf):  # noqa: F811
    """8 orbits (real summer MCD19A2 tiles reach 7-8): rule keeps the
    first Aqua and reads layer 0 (the documented reference quirk)."""
    stamps = " ".join(
        f"201723000{i}0{'A' if i in (3, 6) else 'T'}" for i in range(8))
    fake_pyhdf(stamps)
    g = read_maiac_hdf4("eight_orbits.hdf")
    assert list(g.layers) == ["20172300030A"]
    assert g.layers["20172300030A"][1, 1] == pytest.approx(0.1)  # layer 0


# ---------------------------------------------------------------------------
# UTM: antimeridian and zone boundaries
# ---------------------------------------------------------------------------

def _swath(lat0, lon_west, lat_span, lon_span, n=24):
    """A small regular swath (lat descending like a real scan)."""
    lats = np.linspace(lat0 + lat_span, lat0, n)
    lons = lon_west + np.linspace(0.0, lon_span, n)
    lon_g, lat_g = np.meshgrid(lons, lats)
    # wrap into [-180, 180)
    lon_g = (lon_g + 180.0) % 360.0 - 180.0
    return lat_g, lon_g


def test_antimeridian_swath_extent_sane():
    """A swath straddling ±180° (zone 1/60) must produce a grid of the
    swath's physical size — pre-fix, the unwrapped Δlon blew the easting
    extent to planetary scale."""
    lat_g, lon_g = _swath(-42.0, 179.0, 2.0, 2.0)   # 179°E → 181°E(=-179°)
    rs = UTMResampler(lat_g, lon_g, pixel_size=2000.0)
    assert rs.zone in (1, 60)
    ew_km = (rs.extent[2] - rs.extent[0]) / 1e3
    ns_km = (rs.extent[3] - rs.extent[1]) / 1e3
    # ~2° lon at 42S ≈ 165 km, 2° lat ≈ 222 km (+ projection slack)
    assert 100 < ew_km < 400, ew_km
    assert 150 < ns_km < 400, ns_km
    # gather plan equals brute-force NN in the same projection
    x, y = rs.proj.forward(lon_g, lat_g)
    txv, tyv = rs._cell_centers()
    d2 = ((x.ravel()[None, :] - txv.ravel()[:, None]) ** 2
          + (y.ravel()[None, :] - tyv.ravel()[:, None]) ** 2)
    brute = np.argmin(d2, axis=1).reshape(rs.index_map.shape)
    np.testing.assert_array_equal(
        np.where(rs.valid, rs.index_map, -1), np.where(rs.valid, brute, -1))


def test_antimeridian_roundtrip_and_lonlats():
    """forward→inverse across ±180° returns the original wrapped lon (the
    inverse normalizes to [−180, 180))."""
    proj = UTMProjection(zone=60, south=True)
    lons = np.array([178.5, 179.9, -179.9, -178.5])
    lats = np.full(4, -41.0)
    x, y = proj.forward(lons, lats)
    lon2, lat2 = proj.inverse(x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-6)
    np.testing.assert_allclose(lat2, lats, atol=1e-6)
    # resampler lonlats stay wrapped
    lat_g, lon_g = _swath(-42.0, 179.2, 1.0, 1.5)
    rs = UTMResampler(lat_g, lon_g, pixel_size=3000.0)
    lon_grid, lat_grid = rs.lonlats()
    assert np.all(lon_grid >= -180.0) and np.all(lon_grid < 180.0)
    # the grid must cover both sides of the antimeridian
    assert (lon_grid > 170).any() and (lon_grid < -170).any()


def test_zone_boundary_swath_picks_modal_zone():
    """A swath straddling the 12°E zone-32/33 boundary: modal zone wins
    (the reference's rule) and the projection still inverts exactly —
    pixels outside the zone are a documented distortion, not an error."""
    lat_g, lon_g = _swath(46.0, 11.2, 1.5, 1.6)   # 11.2..12.8°E
    zone = utm_zone_of(lon_g)
    assert zone in (32, 33)
    rs = UTMResampler(lat_g, lon_g, pixel_size=2000.0)
    lon2, lat2 = rs.proj.inverse(*rs.proj.forward(lon_g, lat_g))
    np.testing.assert_allclose(lon2, lon_g, atol=1e-6)
    np.testing.assert_allclose(lat2, lat_g, atol=1e-6)
    assert rs.valid.mean() > 0.5


def test_utm_zone_of_wraps_longitudes():
    # 181° ≡ −179° → zone 1, not an out-of-range zone 61
    assert utm_zone_of(np.array([181.0])) == 1
    assert utm_zone_of(np.array([-181.0])) == 60
    assert utm_zone_of(np.array([179.999])) == 60


# ---------------------------------------------------------------------------
# verify_real_granule: the register's acceptance gate (round 5)
# ---------------------------------------------------------------------------

def _synthetic_npz(tmp_path, size=128):
    from plumekit.io.granule import save_granule
    from plumekit.io.synthetic import SyntheticSceneConfig, make_scene

    scene = make_scene(SyntheticSceneConfig(
        size=size, n_plumes=2, seed=3, background_level=0.2,
        background_noise=0.05, fires_per_plume=(4, 6)))
    gpath = str(tmp_path / "scene.npz")
    save_granule(gpath, scene.granule)
    fpath = str(tmp_path / "fires.csv")
    scene.fires.drop(columns=["date_time"]).to_csv(fpath, index=False)
    return gpath, fpath


def test_verify_granule_synthetic_all_pass(tmp_path):
    from plumekit.io.verify import verify_granule

    gpath, fpath = _synthetic_npz(tmp_path)
    res = verify_granule(gpath, fires_csv=fpath, detector="basic")
    assert res.ok, res.summary()
    names = {c.name for c in res.checks}
    assert {"decode", "layers", "grid_shape", "lat_range", "lon_range",
            "utm_resample", "identify"} <= names
    assert all(c.status == "pass" for c in res.checks
               if c.name == "identify")


def test_verify_granule_hdf_stub(fake_pyhdf, tmp_path):  # noqa: F811
    """The stubbed HDF4 path passes decode/orbit-stamp/value checks
    end-to-end (the closest a no-real-data environment can get)."""
    from plumekit.io.verify import verify_granule

    fake_pyhdf("20172302054T 20172302055A")
    gp = tmp_path / "fake_granule.hdf"
    gp.touch()  # the stub ignores content; verify checks existence first
    res = verify_granule(str(gp), run_identify=False)
    by = {c.name: c for c in res.checks}
    assert by["decode"].status == "pass"
    assert by["orbit_stamps"].status == "pass"
    assert res.ok, res.summary()


def test_verify_granule_named_failures(fake_pyhdf, tmp_path,  # noqa: F811
                                       monkeypatch):
    from plumekit.io.verify import verify_granule

    # malformed orbit stamp → decode FAILS with the named error
    fake_pyhdf("NOT_A_STAMP")
    bp = tmp_path / "bad.hdf"
    bp.touch()
    res = verify_granule(str(bp), run_identify=False)
    assert not res.ok
    assert "malformed orbit timestamp" in res.checks[0].detail

    # missing file
    res2 = verify_granule(str(tmp_path / "nope.npz"))
    assert not res2.ok


def test_verify_granule_value_range_violation(tmp_path):
    """A granule whose 'AOD' is unscaled (raw counts ~1000) must fail the
    value check — the classic forgot-the-0.001-scale mistake."""
    from plumekit.io.granule import Granule, save_granule
    from plumekit.io.verify import verify_granule

    lat, lon = np.mgrid[40:41:32j, -105:-104:32j]
    g = Granule(layers={"t0": np.full((32, 32), 1500.0, np.float32)},
                lat=lat, lon=lon, name="raw_counts")
    path = str(tmp_path / "raw.npz")
    save_granule(path, g)
    res = verify_granule(path, run_identify=False)
    assert not res.ok
    assert any(c.name.startswith("values") and c.status == "fail"
               for c in res.checks)


def test_verify_cli_exit_codes(tmp_path, capsys):
    import json

    from plumekit.cli import main as cli_main

    gpath, fpath = _synthetic_npz(tmp_path)
    rc = cli_main(["verify_real_granule", gpath, "--fires", fpath,
                   "--detector", "basic"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert rc == 0 and payload["ok"] and not payload["failed"]
    assert cli_main(["verify_real_granule",
                     str(tmp_path / "missing.hdf")]) == 1


def test_struct_metadata_corruption_modes(fake_pyhdf,  # noqa: F811
                                          monkeypatch):
    """More corruption shapes of the regex-parsed StructMetadata
    (tools.py:94-122): truncated corner tuple, one corner missing, and
    non-numeric coordinates — every one must fail NAMED, never with a
    bare AttributeError/IndexError."""
    from plumekit.io.granule import read_maiac_hdf4

    modes = [
        # truncated mid-tuple
        "GROUP=GridStructure UpperLeftPointMtrs=(-7783653.6",
        # LR missing entirely
        ("GROUP=GridStructure UpperLeftPointMtrs=(-7783653.63,4447802.07) "
         "END_GROUP=GridStructure"),
        # non-numeric coordinates
        ("UpperLeftPointMtrs=(abc,def) LowerRightMtrs=(ghi,jkl)"),
    ]
    for meta in modes:
        fake_pyhdf("20172302054A")

        def bad_attrs(self, full=1, _m=meta):
            return {"Orbit_time_stamp": ("20172302054A", 0, 0, 0),
                    "StructMetadata.0": (_m, 0, 0, 0)}

        monkeypatch.setattr(_FakeSD, "attributes", bad_attrs)
        with pytest.raises(ValueError, match="StructMetadata"):
            read_maiac_hdf4("corrupt.hdf")
