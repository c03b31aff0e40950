#!/bin/bash
# End-of-round gate (see .claude/skills/verify/SKILL.md): the slow
# sharding suite rotted silently in round 2, so every round must end
# with ALL of these green, serialized (one CPU core):
#   1. default test suite
#   2. multi-chip parity slow suite (all 16 methods, virtual 8-dev mesh)
#   3. driver entry points (entry + dryrun_multichip)
set -ex
cd /root/repo
python -m pytest tests/ -q
python -m pytest tests/test_sharding.py -m slow -q
python __graft_entry__.py
echo END_OF_ROUND_GREEN
