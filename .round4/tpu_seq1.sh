#!/bin/bash
cd /root/repo
echo "=== job1: baseline ceiling at HEAD ===" 
BENCH_SKIP_E2E=1 timeout 2400 python scripts/bench_reconcile.py > .round4/reconcile_head.json 2> .round4/reconcile_head.err
echo "job1 rc=$?"
echo "=== job2: FFT_FLASH_MXU_LSUM=1 ==="
FFT_FLASH_MXU_LSUM=1 BENCH_SKIP_E2E=1 timeout 3600 python scripts/bench_reconcile.py > .round4/reconcile_mxulsum.json 2> .round4/reconcile_mxulsum.err
echo "job2 rc=$?"
echo "=== job3: fresh profile at HEAD ==="
PROFILE_DIR=/tmp/fft_profile_r4 timeout 3600 python scripts/profile_step.py > .round4/profile_head.json 2> .round4/profile_head.err
echo "job3 rc=$?"
echo ALL_DONE
