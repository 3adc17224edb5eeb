#!/usr/bin/env bash
# Preflight gate: run the test files that cover the modules touched by
# the pending change (staged + unstaged + untracked vs HEAD), so a red
# test never lands in a commit (VERDICT r4 next #1 — the honor-system
# gate failed three rounds running; this makes it mechanical).
#
# Usage:
#   scripts/preflight.sh          # test files mapped from the diff
#   scripts/preflight.sh --full   # whole suite (slow, ~25 min)
#
# Exit status is pytest's; 0 also when the diff touches nothing with
# mapped tests (docs-only changes), after printing what was skipped.
set -u
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--full" ]]; then
    exec python -m pytest tests/ -q
fi

changed=$( (git diff --name-only HEAD; git ls-files --others --exclude-standard) | sort -u)
if [[ -z "$changed" ]]; then
    echo "preflight: working tree clean vs HEAD — nothing to check"
    exit 0
fi

# module -> test-file map. A changed test file selects itself; a changed
# source module selects every test file whose name or content references
# it. conftest/core changes run the whole suite.
declare -A picked=()
run_full=0
while IFS= read -r f; do
    case "$f" in
        tests/conftest.py|nfs_tpu/core/*|nfs_tpu/__init__.py|pyproject.toml)
            run_full=1 ;;
        tests/test_*.py)
            picked["$f"]=1 ;;
        tests/gradcheck.py)
            picked["tests/test_ops.py"]=1; picked["tests/test_pallas.py"]=1 ;;
        nfs_tpu/*.py|nfs_tpu/*/*.py)
            mod=$(basename "$f" .py)
            pkg=$(basename "$(dirname "$f")")
            # name match first (test_<mod>.py), then content match on the
            # module path (nfs_tpu.<pkg>.<mod> or <pkg>/<mod>)
            [[ -f "tests/test_${mod}.py" ]] && picked["tests/test_${mod}.py"]=1
            while IFS= read -r t; do
                picked["$t"]=1
            done < <(grep -ls -e "nfs_tpu\.${pkg}\.${mod}\b" \
                             -e "nfs_tpu\.${pkg} import .*\b${mod}\b" \
                             -e "from nfs_tpu\.${pkg}\b" \
                             tests/test_*.py 2>/dev/null)
            ;;
        bench/*.py|bench.py)
            picked["tests/test_bench_stages.py"]=1 ;;
    esac
done <<< "$changed"

if [[ $run_full -eq 1 ]]; then
    echo "preflight: core/conftest touched — running the FULL suite"
    exec python -m pytest tests/ -q
fi

if [[ ${#picked[@]} -eq 0 ]]; then
    echo "preflight: no mapped tests for changed files:"
    printf '  %s\n' $changed
    exit 0
fi

echo "preflight: running ${#picked[@]} test file(s) for the pending diff:"
printf '  %s\n' "${!picked[@]}"
exec python -m pytest "${!picked[@]}" -q
