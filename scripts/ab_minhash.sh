#!/bin/bash
# Same-session A/B isolation of the dedup_minhash_lsh bench creep
# (round-9 verdict task 2).  Three variants, each benched via the
# standard bench.py (median-of-3 per query), two interleaved passes:
#   head       = current HEAD
#   barelower  = HEAD with fold_lower -> bare lower() (no translate)
#   pre_null   = b0d39dc~ (before the NULL-guard + unicode fixes)
set -e
cd /root/repo
HEAD_SHA=$(git rev-parse HEAD)
PRE_SHA=$(git rev-parse b0d39dc~)
export SPARK_GRAFT_NO_CONTROL=1
mk() { # $1 name  $2 sha
  local wt=/tmp/ab_$1
  git worktree remove --force $wt 2>/dev/null || true
  git worktree add --force --detach $wt $2 >/dev/null
}
mk head $HEAD_SHA
mk barelower $HEAD_SHA
# patch barelower: fold_lower -> bare lower (Spark side only; bench never runs oracles)
python - <<'PY'
import re
p = "/tmp/ab_barelower/duckdb_hdfs_spark/functions/hashing.py"
s = open(p).read()
s = s.replace("return F.lower(F.translate(col, _CASEFOLD_SRC, _CASEFOLD_DST))",
              "return F.lower(col)")
open(p, "w").write(s)
print("patched:", "F.lower(col)" in s)
PY
mk pre_null $PRE_SHA
for pass_n in 1 2; do
  for v in head barelower pre_null; do
    echo "=== pass $pass_n variant $v ==="
    (cd /tmp/ab_$v && python bench.py 2>/dev/null | tail -1)
  done
done
for v in head barelower pre_null; do git worktree remove --force /tmp/ab_$v; done
