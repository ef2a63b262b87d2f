"""Zero-shot raw-EMIT inference (reference inference_on_raw_EMIT_nc_file.ipynb).

    python examples/emit_zero_shot.py EMIT_L1B_RAD_xxx.nc checkpoint.ckpt out/

Pipeline: raw granule -> band select (2122-2488nm) -> CH4 template ->
column-blocked matched filter (Pallas-fused on TPU) -> EMIT->AVIRIS
renormalization -> reflect-padded whole-scene U-Net forward -> GLT
georeference. Equivalent CLI: ``python -m starcop_tpu.cli.infer_emit``.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from starcop_tpu.cli.infer_emit import main

if __name__ == "__main__":
    granule, checkpoint, out = sys.argv[1:4]
    sys.exit(main([granule, "--checkpoint", checkpoint, "--output", out, "--georeference"]))
