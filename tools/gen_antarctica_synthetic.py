"""Synthetic realistic-format Antarctica input data.

The reference's realistic integrated tests
(automated_testing/integrated_tests/realistic/Antarctica/) read
BedMachine / RACMO / Shapiro-Ritzwoller / thinning-rate files from
external/data, which are not shipped with the repository (and this
environment has no network egress). This generator synthesises a
glaciologically coherent Antarctica-like continent in the EXACT file
formats those tests read:

  - topography:   x/y grid, BedMachine variable names
                  ('bed', 'surface', 'thickness')
  - climate:      x/y grid RACMO-style monthly snapshot
                  (Hs, T2m[12], Precip[12])
  - SMB:          x/y grid, 'SMB' field, no time dimension
                  (choice_SMB_prescribed = 'SMB_no_time')
  - geothermal:   global lon/lat 'hflux' [W m^-2]
                  (Shapiro & Ritzwoller 2004 layout)
  - thinning:     x/y grid 'dHdt' [m/yr] (dHdt_antarctica layout)

so the full realistic pipeline - read_from_file geometry -> mesh
creation -> DIVA + thermodynamics + invBMB/invfric inversion ->
remeshing - runs end-to-end. The continent: an East-Antarctic Vialov
dome on an elevated bed, a marine West-Antarctic sector (bed well below
sea level), and two ice-shelf embayments (Ross / Filchner-Ronne
analogues). All fields are deterministic (seeded).
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ufemism2_tpu.io.ncio import NCFile
from ufemism2_tpu.utils.constants import ice_density, seawater_density

DATA_DIR = Path(__file__).resolve().parent.parent / \
    "validation_runs" / "ant_data"

XMIN, XMAX = -3040e3, 3040e3
S0 = 3900.0          # [m] dome summit surface elevation
N_GLEN = 3.0


def _smooth_noise(shape, rng, sigma_cells, amp):
    """Deterministic smooth random field (gaussian-filtered white noise)."""
    from scipy.ndimage import gaussian_filter
    f = gaussian_filter(rng.standard_normal(shape), sigma_cells)
    return amp * f / max(np.abs(f).max(), 1e-12)


def make_geometry(dx=20e3):
    """(x, y, Hb, Hs, Hi) Antarctica-like synthetic geometry."""
    x = np.arange(XMIN, XMAX + dx / 2, dx)
    y = np.arange(XMIN, XMAX + dx / 2, dx)
    X, Y = np.meshgrid(x, y, indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2)
    th = np.arctan2(Y, X)
    rng = np.random.default_rng(20260819)

    # grounded-margin radius: wobbly continent outline
    Rm = (1750e3 + 260e3 * np.sin(2 * th + 1.0)
          + 140e3 * np.sin(5 * th - 0.4) + 90e3 * np.sin(3 * th + 2.2))

    # bed: elevated East-Antarctic plateau, marine West-Antarctic sector,
    # continental shelf dropping to the abyssal plain outside
    west = 0.5 * (1 + np.tanh((np.cos(th - 2.6) - 0.35) / 0.18))
    Hb = (500.0 - 900.0 * (r / 2200e3) ** 2
          + _smooth_noise(X.shape, rng, 6.0, 450.0)
          - 1400.0 * west * np.exp(-((r - 900e3) / 700e3) ** 2))
    beyond = np.maximum(0.0, r - Rm)
    Hb = Hb - 2800.0 * np.minimum(1.0, beyond / 600e3) ** 1.5
    Hb = np.maximum(Hb, -3600.0)

    # Vialov profile surface inside the margin
    p = 1.0 + 1.0 / N_GLEN
    q = N_GLEN / (2.0 * N_GLEN + 2.0)
    s_vialov = S0 * np.maximum(0.0, 1.0 - (r / Rm) ** p) ** q

    # two shelf embayments (Ross / Filchner-Ronne analogues): floating
    # tongues extending past the grounded margin
    shelf = np.zeros_like(r)
    for th0, w, L in ((-2.0, 0.35, 420e3), (2.9, 0.30, 380e3)):
        dth = np.arctan2(np.sin(th - th0), np.cos(th - th0))
        sector = np.exp(-(dth / w) ** 2)
        ext = (r > 0.82 * Rm) & (r < Rm + L) & (sector > 0.3)
        Hi_sh = 900.0 * np.exp(-np.maximum(0.0, r - 0.82 * Rm) / 260e3)
        shelf = np.where(ext, np.maximum(shelf, Hi_sh * sector), shelf)

    # combine: grounded where the Vialov column does not float
    rho = ice_density / seawater_density
    Hi_grounded = np.maximum(0.0, s_vialov - Hb)
    floats = Hi_grounded * ice_density < -np.minimum(Hb, 0.0) \
        * seawater_density
    Hi = np.where(r < Rm, np.where(floats, s_vialov / (1.0 - rho),
                                   Hi_grounded), 0.0)
    Hi = np.maximum(Hi, shelf)
    # re-derive the consistent surface
    floats = Hi * ice_density < -np.minimum(Hb, 0.0) * seawater_density
    Hs = np.where(floats, Hi * (1.0 - rho), Hi + Hb)
    Hi = np.where(Hi < 5.0, 0.0, Hi)
    Hs = np.where(Hi == 0.0, np.maximum(Hb, 0.0), Hs)
    return x, y, Hb, Hs, Hi


def write_all(dx=20e3, data_dir=DATA_DIR):
    data_dir = Path(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    x, y, Hb, Hs, Hi = make_geometry(dx)

    def xy_file(name, fields):
        pth = data_dir / name
        with NCFile(pth, "w") as nc:
            nc.def_dim("x", len(x))
            nc.def_dim("y", len(y))
            nc.def_var("x", ("x",)); nc.put("x", x)
            nc.def_var("y", ("y",)); nc.put("y", y)
            for fname, arr in fields.items():
                if arr.ndim == 3:      # [12, nx, ny] monthly
                    if not nc.has("month"):
                        nc.def_dim("month", 12)
                        nc.def_var("month", ("month",))
                        nc.put("month", np.arange(1.0, 13.0))
                    nc.def_var(fname, ("month", "x", "y"))
                else:
                    nc.def_var(fname, ("x", "y"))
                nc.put(fname, arr)
        return pth

    # 1. topography, BedMachine names
    topo = xy_file("BedMachine_Antarctica_synthetic.nc",
                   {"bed": Hb, "surface": Hs, "thickness": Hi})

    # 2. RACMO-style climate snapshot: T2m/Precip monthly + snapshot Hs
    season = 14.0 * np.cos(2 * np.pi * (np.arange(12) + 0.5) / 12.0)
    lat_like = np.sqrt(np.maximum(0.0, 1.0 - (np.hypot(
        *np.meshgrid(x, y, indexing="ij")) / 3040e3) ** 2))
    T_ann = 273.15 - 18.0 - 0.0085 * Hs - 8.0 * lat_like
    T2m = T_ann[None, :, :] + season[:, None, None]
    # precip: moisture starved interior, wetter coast [m w.e./yr]
    P_ann = 0.04 + 1.1 * np.exp(-np.maximum(Hs, 0.0) / 900.0)
    Precip = np.repeat(P_ann[None, :, :] / 12.0, 12, axis=0)
    clim = xy_file("RACMO_Antarctica_synthetic_clim.nc",
                   {"Hs": Hs, "T2m": T2m, "Precip": Precip})

    # 3. prescribed SMB [m ice/yr], no time dimension
    SMB = (P_ann * 1000.0 / ice_density) * 0.9 - 0.02
    smb = xy_file("RACMO_Antarctica_synthetic_SMB.nc", {"SMB": SMB})

    # 4. thinning-rate target [m/yr]: modest West-Antarctic thinning
    X, Y = np.meshgrid(x, y, indexing="ij")
    th = np.arctan2(Y, X)
    west = 0.5 * (1 + np.tanh((np.cos(th - 2.6) - 0.35) / 0.18))
    dHdt = -0.25 * west * (Hi > 0) * np.exp(
        -((np.hypot(X, Y) - 1500e3) / 500e3) ** 2)
    dhdt = xy_file("dHdt_Antarctica_synthetic.nc", {"dHdt": dHdt})

    # 5. geothermal heat flux, global lon/lat [W m^-2]
    lon = np.linspace(0.0, 358.0, 180)
    lat = np.linspace(-90.0, 90.0, 91)
    LON, LAT = np.meshgrid(lon, lat, indexing="ij")
    hflux = (0.054 + 0.012 * np.cos(np.deg2rad(LAT))
             + 0.008 * np.sin(2 * np.deg2rad(LON)) *
             np.cos(np.deg2rad(LAT)))
    ghf = data_dir / "ShapiroRitzwoller_synthetic_global.nc"
    with NCFile(ghf, "w") as nc:
        nc.def_dim("lon", len(lon))
        nc.def_dim("lat", len(lat))
        nc.def_var("lon", ("lon",)); nc.put("lon", lon)
        nc.def_var("lat", ("lat",)); nc.put("lat", lat)
        nc.def_var("hflux", ("lon", "lat")); nc.put("hflux", hflux)

    return {"topo": topo, "climate": clim, "SMB": smb, "dHdt": dhdt,
            "ghf": ghf}


def ensure_data(dx=20e3, data_dir=DATA_DIR):
    """Generate the synthetic dataset if absent; return the file map."""
    data_dir = Path(data_dir)
    names = {"topo": "BedMachine_Antarctica_synthetic.nc",
             "climate": "RACMO_Antarctica_synthetic_clim.nc",
             "SMB": "RACMO_Antarctica_synthetic_SMB.nc",
             "dHdt": "dHdt_Antarctica_synthetic.nc",
             "ghf": "ShapiroRitzwoller_synthetic_global.nc"}
    if all((data_dir / n).exists() for n in names.values()):
        return {k: data_dir / n for k, n in names.items()}
    return write_all(dx, data_dir)


if __name__ == "__main__":
    files = write_all()
    for k, v in files.items():
        print(f"{k}: {v} ({os.path.getsize(v) / 1e6:.1f} MB)")
