#!/bin/bash
# Run the test suite on local CPU (8 virtual devices, x64).
# PALLAS_AXON_POOL_IPS must be cleared *before* the interpreter starts:
# the baked sitecustomize otherwise registers the (single-claim, remote)
# TPU backend in every python process and blocks on the device grant.
if [ $# -eq 0 ]; then set -- -x -q; fi
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ "$@"
