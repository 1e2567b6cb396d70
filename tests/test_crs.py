"""CRS: UTM Krüger-series forward/inverse vs independent oracles
(numerically integrated meridian arc, roundtrip, symmetry)."""

import math

import numpy as np
import pytest

from geo_inference_spark.functions.crs import (
    _A,
    _K0,
    check_crs,
    lonlat_to_utm,
    transform_bounds,
    transform_point,
    utm_to_lonlat,
    utm_zone_epsg,
)

A, F = 6378137.0, 1.0 / 298.257223563
E2 = F * (2 - F)


def meridian_arc_numeric(lat_deg: float) -> float:
    """Independent oracle: Simpson integration of the ellipsoid
    meridian integrand a(1-e^2)/(1-e^2 sin^2 phi)^{3/2}."""
    phi = np.linspace(0.0, math.radians(lat_deg), 20001)
    integrand = A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5
    h = phi[1] - phi[0]
    return float(
        h / 3 * (integrand[0] + integrand[-1]
                 + 4 * integrand[1:-1:2].sum() + 2 * integrand[2:-1:2].sum())
    )


def test_utm_central_meridian_anchor():
    """On the central meridian: easting exactly 500000, northing ==
    k0 * meridian arc length (vs numeric integration, < 0.5 mm)."""
    for lat in (0.0, 12.3, 45.0, 71.5):
        e, n = lonlat_to_utm(-75.0, lat, 32618)  # zone 18N, lon0 = -75
        assert e == pytest.approx(500_000.0, abs=1e-6)
        assert n == pytest.approx(_K0 * meridian_arc_numeric(lat), abs=5e-4)
    # rectifying radius sanity: quarter meridian == A * pi/2
    assert meridian_arc_numeric(90.0) == pytest.approx(_A * math.pi / 2, abs=1e-3)


def test_utm_roundtrip_grid():
    rng = np.random.RandomState(2)
    for _ in range(200):
        lon = rng.uniform(-180, 180)
        lat = rng.uniform(-80, 84)
        epsg = utm_zone_epsg(lon, lat)
        e, n = lonlat_to_utm(lon, lat, epsg)
        lon2, lat2 = utm_to_lonlat(e, n, epsg)
        assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
        # inside-zone coordinates stay in the standard ranges
        assert 100_000 < e < 900_000
        assert 0 <= n <= 10_000_000


def test_utm_hemisphere_symmetry_and_scale():
    en, nn = lonlat_to_utm(7.0, 46.5, 32632)
    es, ns = lonlat_to_utm(7.0, -46.5, 32732)
    assert es == pytest.approx(en, abs=1e-6)
    assert ns == pytest.approx(10_000_000.0 - nn, abs=1e-6)
    # 1 degree of longitude at the equator ~ 111.32 km * k0
    e1, _ = lonlat_to_utm(-74.0, 0.0, 32618)
    assert e1 - 500_000 == pytest.approx(111_319.49 * _K0, rel=2e-4)


def test_transform_point_chains():
    # 4326 -> UTM -> 3857 -> 4326 closes
    lon, lat = -73.99, 40.73
    e, n = transform_point(4326, 32618, lon, lat)
    x, y = transform_point(32618, 3857, e, n)
    lon2, lat2 = transform_point(3857, 4326, x, y)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
    assert check_crs("epsg:32618") == "EPSG:32618"


def test_transform_bounds_utm_densified():
    b = transform_bounds(4326, 32632, 6.0, 45.0, 12.0, 48.0)
    # bbox corners alone under-cover a curved UTM edge; the densified
    # bounds must CONTAIN every transformed interior sample
    rng = np.random.RandomState(1)
    for _ in range(100):
        lon = rng.uniform(6.0, 12.0)
        lat = rng.uniform(45.0, 48.0)
        e, n = lonlat_to_utm(lon, lat, 32632)
        assert b[0] - 1e-6 <= e <= b[2] + 1e-6
        assert b[1] - 1e-6 <= n <= b[3] + 1e-6
    with pytest.raises(ValueError):
        transform_bounds(4326, "EPSG:9999", 0, 0, 1, 1)
