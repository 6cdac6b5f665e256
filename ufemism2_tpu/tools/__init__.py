"""Post-processing tools (the L10 layer): run inspection, diagnostics and
plotting of model output.

Re-design of tools/python/upsy/ (Run/Mesh/Timeframe classes + the
upsy-diagnose-run / upsy-plot-2dfigure CLIs)."""

from .run import Run
