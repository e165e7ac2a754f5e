#!/bin/bash
# Round-3 lever: raise XLA's scoped-VMEM limit so the flash-attention kernel
# can run larger batch groups (round 2: legacy fwd G=8 needs 18.79M vs the
# ~16M default scoped limit — OOM by 2.8M). Each variant needs its own
# process (XLA_FLAGS bind at backend init). Run ALONE: exclusive chip.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  local tag="$1" vmem_kib="$2" budget_mb="$3"
  echo "=== $tag (scoped_vmem=${vmem_kib}KiB attn_budget=${budget_mb}MB) ==="
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=${vmem_kib}" \
  LATTECLIP_ATTN_BUDGET_MB="${budget_mb}" \
  timeout 3000 python tools/r3_levers.py base 2>&1 | grep -E "RESULT|warm|FAILED" \
    | sed "s/^/[$tag] /"
}

run g8   32768  24
run g16  65536  48
