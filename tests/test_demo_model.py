"""Demo model: the fields-framework fixture (reference
src/UPSY/models/demo_model) - run, conserve, remap, restart."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def meshes():
    from ufemism2_tpu.mesh import build_uniform_mesh
    m1 = build_uniform_mesh(-100e3, 100e3, -100e3, 100e3, 20e3)
    m2 = build_uniform_mesh(-100e3, 100e3, -100e3, 100e3, 15e3)
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    return (m1, build_mesh_data(m1)), (m2, build_mesh_data(m2))


def test_demo_a_diffuses(meshes):
    from ufemism2_tpu.models.demo import DemoModel
    (m1, md1), _ = meshes
    demo = DemoModel(choice="a")
    s0 = demo.initialise(md1)
    s1 = demo.run(s0, 20.0)
    # diffusion lowers the peak, preserves positivity
    assert float(s1.phi.max()) < float(s0.phi.max())
    assert float(s1.phi.min()) >= -1e-12
    assert float(s1.t) == pytest.approx(20.0)


def test_demo_b_rotates(meshes):
    from ufemism2_tpu.models.demo import DemoModel
    (m1, md1), _ = meshes
    demo = DemoModel(choice="b")
    s0 = demo.initialise(md1)
    s1 = demo.run(s0, 10.0)
    # advection approximately preserves the max (nearest-vertex scheme)
    assert float(s1.phi.max()) == pytest.approx(float(s0.phi.max()),
                                                rel=0.2)


def test_demo_remap_and_restart(meshes, tmp_path):
    from ufemism2_tpu.models.demo import DemoModel
    (m1, md1), (m2, md2) = meshes
    demo = DemoModel(choice="a")
    s = demo.run(demo.initialise(md1), 5.0)
    mass1 = float((s.phi * md1.A).sum())
    s2 = demo.remap(s, m1, m2, md2)
    mass2 = float((s2.phi * md2.A).sum())
    assert mass2 == pytest.approx(mass1, rel=1e-2)   # conservative remap
    # restart round-trip
    p = str(tmp_path / "demo_restart.nc")
    demo.write_restart(p, m2, s2)
    s3 = demo.read_restart(p, md2)
    assert np.allclose(np.asarray(s3.phi), np.asarray(s2.phi))
    assert float(s3.t) == pytest.approx(float(s2.t))
    # and the model keeps running on the new mesh
    s4 = demo.run(s3, float(s3.t) + 5.0)
    assert np.isfinite(np.asarray(s4.phi)).all()
