"""Config system tests (reference .cfg namelist compatibility)."""

import glob

import pytest

from ufemism2_tpu.config import Config, load_config, parse_namelist

REF = "/root/reference"


def test_defaults():
    C = Config()
    assert C.nz == 12
    assert C.pc_epsilon == 0.005
    assert C.Glens_flow_law_exponent == 3.0
    assert C.dt_ice_max == 10.0
    assert C.choice_zeta_grid == "regular"


def test_replace_immutable():
    C = Config()
    C2 = C.replace(nz=15)
    assert C2.nz == 15 and C.nz == 12
    with pytest.raises(AttributeError):
        C.nz = 20


def test_unknown_key_crashes():
    from ufemism2_tpu.utils.logging_utils import CrashError
    with pytest.raises(CrashError):
        Config(not_a_real_parameter=1.0)


def test_parse_halfar_config():
    C = load_config(f"{REF}/automated_testing/integrated_tests/idealised/"
                    "Halfar_dome/config_Halfar_5km.cfg")
    assert C.refgeo_idealised_Halfar_H0 == 3000.0
    assert C.refgeo_idealised_Halfar_R0 == 500e3
    assert C.end_time_of_run == 500.0
    assert C.choice_stress_balance_approximation == "SIA"
    assert C.maximum_resolution_ice_front == 5e3
    assert C.do_ANT and not C.do_GRL


def test_parse_all_reference_configs():
    cfgs = (glob.glob(f"{REF}/automated_testing/integrated_tests/**/*.cfg",
                      recursive=True)
            + glob.glob(f"{REF}/config-files/*.cfg"))
    assert len(cfgs) > 100
    for f in cfgs:
        load_config(f)


def test_fortran_float_quirks(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("&CONFIG\n"
                 "  uniform_Glens_flow_factor_config = 1.0-17\n"
                 "  pc_epsilon_config = 5E-3\n"
                 "  dt_ice_max_config = 10.\n"
                 "/\n")
    C = load_config(p)
    assert C.uniform_Glens_flow_factor == 1.0e-17
    assert C.pc_epsilon == 5e-3
    assert C.dt_ice_max == 10.0
