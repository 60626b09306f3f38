"""Geodesy golden tests (native sinusoidal/UTM/haversine vs closed-form and
scipy-free references)."""

import numpy as np
import pytest

from plumekit.geo import (
    haversine_km,
    sinusoidal_to_wgs84,
    wgs84_to_sinusoidal,
    grid_from_extent,
    parse_struct_metadata,
    utm_zone_of,
    UTMProjection,
    UTMResampler,
)


def test_haversine_known_distance():
    # London -> Paris ~ 343-344 km at the reference's 6367 km radius
    d = haversine_km(-0.1278, 51.5074, 2.3522, 48.8566)
    assert 340 < float(d) < 348


def test_haversine_zero():
    assert float(haversine_km(10.0, -20.0, 10.0, -20.0)) == 0.0


def test_sinusoidal_roundtrip():
    lon = np.array([-60.0, -55.1, 10.0])
    lat = np.array([-10.0, 5.3, 45.0])
    x, y = wgs84_to_sinusoidal(lon, lat)
    lon2, lat2 = sinusoidal_to_wgs84(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_grid_from_extent_shape_and_monotonicity():
    # one MODIS tile (h12v11-ish): 1200x1200 starting near (-60, -20)
    x0, y0 = wgs84_to_sinusoidal(-60.0, -20.0)
    x1, y1 = wgs84_to_sinusoidal(-50.0, -30.0)
    lat, lon = grid_from_extent(x0, y0, x1, y1, 120, 120)
    assert lat.shape == (120, 120)
    assert np.all(np.diff(lat[:, 0]) < 0)  # lat decreases down rows (UL->LR)


def test_parse_struct_metadata():
    meta = """GROUP=GridStructure
        UpperLeftPointMtrs=(-6671703.118000,-1111950.519667)
        LowerRightMtrs=(-5559752.598333,-2223901.039333)
    END"""
    x0, y0, x1, y1 = parse_struct_metadata(meta)
    assert x0 == -6671703.118 and y1 == -2223901.039333


def test_utm_zone():
    assert utm_zone_of(np.array([-60.0, -60.2, -59.8])) == 21
    assert utm_zone_of(np.array([0.5])) == 31


def test_utm_roundtrip_and_known_point():
    proj = UTMProjection(zone=31, south=False)
    # canonical check: (lat 0, lon 3) is the zone-31 central meridian on the
    # equator -> easting 500000, northing 0
    e, n = proj.forward(3.0, 0.0)
    assert abs(e - 500000.0) < 1e-3 and abs(n) < 1e-3
    # round trip accuracy ~1e-7 deg over the zone
    lons = np.linspace(0.5, 5.5, 7)
    lats = np.linspace(-70, 70, 7)
    for lo in lons:
        for la in lats:
            e, n = proj.forward(lo, la)
            lo2, la2 = proj.inverse(e, n)
            assert abs(lo2 - lo) < 1e-6 and abs(la2 - la) < 1e-6


def test_utm_resampler_identity_grid():
    # a small lat/lon grid resampled to its own UTM box: every output cell
    # should pick a nearby swath pixel and carry its value
    lat, lon = np.meshgrid(
        np.linspace(-10.2, -10.0, 24), np.linspace(-60.2, -60.0, 24), indexing="ij"
    )
    img = np.arange(24 * 24, dtype=np.float32).reshape(24, 24)
    rs = UTMResampler(lat, lon, pixel_size=1000.0)
    out = rs.resample_image(img)
    assert out.shape == (rs.y_size, rs.x_size)
    valid = out != -999.0
    assert valid.mean() > 0.9
    assert set(np.unique(out[valid])).issubset(set(img.ravel()))


def test_sinusoidal_off_lens_returns_nan():
    """Points outside the sinusoidal lens (beyond-pole y, |x| beyond the
    parallel's circumference) must return NaN, never huge finite degrees
    (measured pre-fix: lon = -449.7 deg just past the pole)."""
    from plumekit.geo.sinusoidal import SINU_RADIUS_M

    R = SINU_RADIUS_M
    # beyond the pole
    lon, lat = sinusoidal_to_wgs84(np.array([0.0]),
                                   np.array([R * (np.pi / 2 + 0.01)]))
    assert np.isnan(lon[0]) and np.isnan(lat[0])
    # x beyond the parallel circumference near the pole
    lon, lat = sinusoidal_to_wgs84(np.array([1e5]),
                                   np.array([R * np.deg2rad(89.9999)]))
    assert np.isnan(lon[0])
    # a valid mid-latitude point stays exact
    lon, lat = sinusoidal_to_wgs84(np.array([1e6]),
                                   np.array([R * np.deg2rad(45.0)]))
    assert np.isfinite(lon[0]) and abs(lat[0] - 45.0) < 1e-9


def test_subset_fires_nan_grid_corners():
    """A grid with NaN corners (polar tile) must keep its bbox from the
    finite pixels instead of dropping every fire."""
    import pandas as pd

    from plumekit.io.fires import subset_fires_to_image

    lat = np.linspace(40, 42, 8)[:, None] * np.ones((1, 8))
    lon = np.ones((8, 1)) * np.linspace(-5, -3, 8)[None, :]
    lat[0, 0] = lon[0, 0] = np.nan
    fires = pd.DataFrame({"latitude": [41.0], "longitude": [-4.0],
                          "frp": [50.0], "date_time": ["2016-05-02"]})
    sub = subset_fires_to_image(lat, lon, fires, "2016-05-02")
    assert len(sub) == 1


def test_utm_degenerate_plan_clamps_fill_metadata():
    """All-invalid swath: the 1x1 plan's zone/hemisphere metadata must not
    be derived from raw geolocation fills (-999.3 gave zone 44 south)."""
    from plumekit.geo.utm import UTMResampler

    lats = np.full((6, 6), -999.3)
    lons = np.full((6, 6), -999.3)
    r = UTMResampler(lats, lons, pixel_size=750.0,
                     source_valid=np.zeros((6, 6), bool))
    assert r.x_size == r.y_size == 1 and not r.valid.any()
    assert 1 <= r.zone <= 60
    assert r.zone != 44  # the fill-derived artifact
