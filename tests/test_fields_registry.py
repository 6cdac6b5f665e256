"""Fields framework: metadata-driven remap of the full model state on
mesh updates (the reference's fields_registry + remap-everything walk)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config


def test_field_meta_covers_ice_state():
    """Every IceState field has explicit metadata (no silent defaults)."""
    import dataclasses
    from ufemism2_tpu.core.fields import ICE_FIELD_META
    from ufemism2_tpu.core.ice.state import IceState
    missing = []
    for f in dataclasses.fields(IceState):
        if f.name == "pc":
            continue
        if f.name not in ICE_FIELD_META:
            missing.append(f.name)
    assert missing == [], f"IceState fields without metadata: {missing}"


def test_remap_ice_state_transfers_by_metadata():
    """Conservative/trilinear fields transfer; reinit fields keep the new
    state's values; nudgable bed roughness survives a mesh change (the
    bug the registry fixes - the old hand-picked remap dropped it)."""
    from ufemism2_tpu.mesh import build_uniform_mesh
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    from ufemism2_tpu.core.ice.state import init_ice_state
    from ufemism2_tpu.core.fields import remap_ice_state
    from ufemism2_tpu.remap.atlas import get_map
    from ufemism2_tpu.remap.conservative import build_map_nearest

    m1 = build_uniform_mesh(-100e3, 100e3, -100e3, 100e3, 20e3)
    m2 = build_uniform_mesh(-100e3, 100e3, -100e3, 100e3, 15e3)
    md1 = build_mesh_data(m1)
    md2 = build_mesh_data(m2)

    f = lambda V: 1000.0 + 2e-3 * V[:, 0] - 1e-3 * V[:, 1]
    Hi1 = jnp.asarray(f(m1.V))
    s1 = init_ice_state(md1, Hi1, jnp.zeros(m1.nV),
                        jnp.full(m1.nV, -2000.0), nz=m1.nz)
    s1 = s1.replace(bed_roughness=jnp.asarray(0.5 + 1e-6 * m1.V[:, 0]),
                    dt_ice=jnp.asarray(0.37))

    M_cons = get_map(m1, m2)
    M_tri = get_map(m1, m2, method="trilin")
    M_b = build_map_nearest(m1.TriGC, m2.TriGC, m1.nTri)

    s2_new = init_ice_state(md2, jnp.asarray(f(m2.V)), jnp.zeros(m2.nV),
                            jnp.full(m2.nV, -2000.0), nz=m2.nz)
    s2 = remap_ice_state(s1, s2_new, (M_cons, M_b), (M_tri, M_b))

    # conservative Hi: linear field reproduced (away from the border)
    interior = (np.abs(m2.V[:, 0]) < 70e3) & (np.abs(m2.V[:, 1]) < 70e3)
    Hi2 = np.asarray(s2.Hi)
    exact = f(m2.VorGC)
    assert np.abs(Hi2[interior] - exact[interior]).max() < 5.0
    # trilinear bed roughness survives the update
    br2 = np.asarray(s2.bed_roughness)
    assert np.abs(br2[interior]
                  - (0.5 + 1e-6 * m2.V[interior, 0])).max() < 0.01
    # scalars copied
    assert float(s2.dt_ice) == pytest.approx(0.37)
    # masks are the new state's (reinit), correct shape
    assert s2.mask_grounded_ice.shape == (m2.nV,)
