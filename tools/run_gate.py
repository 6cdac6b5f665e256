"""Run ONE full-tier integrated-test gate and write its scoreboard entry.

Usage: python tools/run_gate.py <gate> [args...]

Gates (VERDICT r2 items 2/5/7 — the reference's own test matrix,
automated_testing/integrated_tests/):
  mismipplus_spinup [end_time]   5 km spinup w/ flow-factor tuning
  mismipplus_ice1r               retreat leg from the spinup restart
  halfar5                        Halfar dome 5 km / 200 yr
  ssa                            SSA_icestream 32/16/8/4 km
  mismip_mod [scale]             4-leg hysteresis chain (resumable)
  berends <method>               Berends2023 nudging experiment I
  ismip_hom_matrix               A-D x SIASSA/DIVA/BPA x 6 lengths

Each gate is resumable where the physics allows it; the companion
driver tools/run_gates.sh retries each gate in a fresh process so a
remote-TPU worker crash resumes instead of restarting."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCOREBOARD = os.path.join(os.path.dirname(__file__), "..", "scoreboard")
RUNS = os.path.join(os.path.dirname(__file__), "..", "validation_runs")


def main():
    gate = sys.argv[1]
    args = sys.argv[2:]
    from ufemism2_tpu.validation import integrated_tests as it

    if gate == "mismipplus_spinup":
        end = float(args[0]) if args else None
        run = it.run_mismipplus_spinup(
            os.path.join(RUNS, "mismipplus_5km_spinup"), SCOREBOARD,
            end_time=end)
    elif gate == "mismipplus_ice1r":
        run = it.run_mismipplus_ice1r(
            os.path.join(RUNS, "mismipplus_5km_spinup"),
            os.path.join(RUNS, "mismipplus_5km_ice1r"), SCOREBOARD)
    elif gate == "halfar5":
        run = it.run_halfar(SCOREBOARD, resolution_km=5,
                            output_dir=os.path.join(RUNS, "halfar_5km"))
    elif gate == "ssa":
        run = it.run_ssa_icestream(SCOREBOARD)
    elif gate == "mismip_mod":
        scale = float(args[0]) if args else 1.0
        run = it.run_mismip_mod(SCOREBOARD,
                                output_dir=os.path.join(RUNS, "mismip_mod"),
                                scale=scale)
    elif gate == "berends":
        method = args[0] if args else "H_dHdt_flowline"
        run = it.run_berends_nudging(method=method,
                                     scoreboard_dir=SCOREBOARD)
    elif gate == "berends2":
        method = args[0] if args else "H_dHdt_flowline"
        run = it.run_berends_exp_II(method=method,
                                    scoreboard_dir=SCOREBOARD)
    elif gate == "antarctica":
        end = float(args[0]) if args else 2000.0
        run = it.run_antarctica_40km(
            os.path.join(RUNS, "antarctica_40km"), SCOREBOARD,
            end_time=end)
    elif gate == "ismip_hom_matrix":
        runs = it.run_ismip_hom_matrix(SCOREBOARD)
        for r in runs:
            print(r.summary(), flush=True)
        return
    else:
        raise SystemExit(f"unknown gate '{gate}'")
    print(run.summary(), flush=True)


if __name__ == "__main__":
    main()
