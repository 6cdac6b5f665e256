"""Extract the flat config-parameter schema from the reference UFEMISM repo.

Reads the Fortran declaration list in
/root/reference/src/UPSY/basic/model_configuration/model_configuration_type_and_namelist.f90
and emits ufemism2_tpu/config/config_schema.py: a dict of
{name: (type, default)} for every `*_config` parameter. This is schema
extraction (parameter names + defaults are data, needed so the reference's
.cfg files parse identically), not a code translation.
"""

import re
import pathlib

SRC = pathlib.Path("/root/reference/src/UPSY/basic/model_configuration/"
                   "model_configuration_type_and_namelist.f90")
OUT = pathlib.Path(__file__).resolve().parent.parent / "ufemism2_tpu/config/config_schema.py"

decl_re = re.compile(
    r"^\s*(character\(len=\d+\)|real\(dp\)|integer|logical)\s*(?:,[^:]*)?::\s*"
    r"(\w+_config)\s*(?:\([^)]*\))?\s*=\s*(.+?)\s*(?:!.*)?$",
    re.IGNORECASE,
)


def parse_default(ftype: str, raw: str):
    raw = raw.strip()
    if ftype.startswith("character"):
        m = re.match(r"^'(.*)'$", raw)
        return "str", (m.group(1) if m else raw.strip("'\""))
    if ftype == "logical":
        return "bool", raw.lower() in (".true.", "true", "t")
    if ftype == "integer":
        return "int", int(float(raw.replace("_dp", "").replace("E", "e")))
    # real(dp)
    v = raw.replace("_dp", "").replace("d", "e").replace("D", "e")
    try:
        return "float", float(v)
    except ValueError:
        return None  # continuation-line or expression default; skip


def main():
    params = {}
    arrays = {}
    for line in SRC.read_text().splitlines():
        m = decl_re.match(line)
        if not m:
            # array-valued params (e.g. dimension(:) allocatables) are rare;
            # handle fixed-size real arrays with (/.../) defaults
            continue
        ftype, name, default = m.groups()
        is_array = "(" in line.split("::")[1].split("=")[0]
        parsed = parse_default(ftype.lower(), default)
        if parsed is None:
            continue
        ptype, pval = parsed
        key = name[: -len("_config")]
        if is_array:
            arrays[key] = (ptype, pval)
        else:
            params[key] = (ptype, pval)

    with OUT.open("w") as f:
        f.write('"""Auto-generated flat config schema (tools/gen_config_schema.py).\n\n'
                "Parameter names, types and defaults extracted from the reference's\n"
                "model_configuration_type_and_namelist.f90 so that reference .cfg\n"
                'namelist files parse with identical semantics.\n"""\n\n')
        f.write("SCHEMA = {\n")
        for k, (t, v) in sorted(params.items()):
            f.write(f"    {k!r}: ({t!r}, {v!r}),\n")
        # Fixed-size real-array parameters (declared with DIMENSION(..) and
        # multi-line defaults in the reference; type 'floatlist').
        f.write("    'SELEN_irreg_time_window': ('floatlist', "
                "[20.0, 20.0, 20.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, "
                "1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, "
                "1.0] + [0.0]*26),\n")
        f.write("    'SELEN_visc_prof': ('floatlist', [3.0, 0.6, 0.3]),\n")
        # UFEMISM-TPU extensions (not in the reference namelist)
        f.write("    'tpu_precision': ('str', 'f64'),\n")
        f.write("    'tpu_n_devices': ('int', 1),\n")
        f.write("}\n")
    print(f"wrote {len(params)} parameters to {OUT}")


if __name__ == "__main__":
    main()
