#!/bin/bash
# Signer default A/B at the 450k scaling pair: classic vs OPH vs OPH+bbit,
# back-to-back so all three share the host's ambient mode.
/root/repo/BENCH/r5/run_pair.sh ab_classic
/root/repo/BENCH/r5/run_pair.sh ab_oph SPARK_GRAFT_SIGNER=oph
/root/repo/BENCH/r5/run_pair.sh ab_ophbbit SPARK_GRAFT_SIGNER=oph SPARK_GRAFT_BBIT=1
