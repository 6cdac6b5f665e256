"""choice_output_field_* support: the reference's configs select extra
output variables (u_3D/v_3D/w_3D/...; model_configuration
choice_output_field_01..50) and its analysis tooling expects them in the
main mesh + grid output files under the same names and dims."""

import numpy as np

from ufemism2_tpu.config import Config


def test_choice_output_fields_written(tmp_path):
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.io.ncio import NCFile

    C = Config(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=100e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="DIVA",
        choice_sliding_law="Weertman",
        choice_basal_hydrology_model="Martin2011",
        xmin_ANT=-750e3, xmax_ANT=750e3,
        ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=300e3,
        maximum_resolution_grounded_ice=300e3,
        maximum_resolution_ice_front=150e3,
        ice_front_width=150e3,
        nit_Lloyds_algorithm=2,
        refgeo_Hi_min=2.0,
        visc_it_nit=3, pc_nit_max=2,
        start_time_of_run=0.0, end_time_of_run=2.0,
        dt_output=2.0,
        choice_output_field_01="u_3D",
        choice_output_field_02="v_3D",
        choice_output_field_03="w_3D",
        choice_output_field_04="u_surf",       # already a default
        choice_output_field_05="uabs_vav",
        choice_output_field_06="SMB",
        choice_output_field_07="mask",
        choice_output_field_08="basal_friction_coefficient",
        choice_output_field_09="R_shear",
        choice_output_field_10="dummy_not_a_field",  # unsupported -> warn
    )
    r = ModelRegion(C, "ANT", output_dir=str(tmp_path))
    r.run_to(2.0)

    nz = r.mesh.nz
    with NCFile(str(tmp_path / "main_output_ANT_00001.nc")) as nc:
        for name, lead in (("u_3D", r.mesh.nTri), ("v_3D", r.mesh.nTri),
                           ("w_3D", r.mesh.nV)):
            v = np.asarray(nc.read(name))
            assert v.shape[1:] == (lead, nz), name
            assert np.isfinite(v).all(), name
        for name in ("uabs_vav", "SMB", "mask",
                     "basal_friction_coefficient", "R_shear"):
            v = np.asarray(nc.read(name))
            assert v.ndim == 2 and np.isfinite(v).all(), name
        # slide/shear ratio is bounded in (0, 1] for SIA-dominated flow
        rs = np.asarray(nc.read("R_shear"))
        assert (rs > 0).all() and (rs <= 1.0 + 1e-6).all()
        assert "dummy_not_a_field" not in nc.h5

    with NCFile(str(tmp_path / "main_output_ANT_grid.nc")) as nc:
        u3 = np.asarray(nc.read("u_3D"))
        # [time, zeta, y, x]
        assert u3.ndim == 4 and u3.shape[1] == nz
        assert np.isfinite(u3).all()
