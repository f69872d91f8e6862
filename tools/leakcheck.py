#!/usr/bin/env python3
"""Local replica of the round driver's leak scan (dev loop only; not part
of the shipped library). Scans the repo's source + docs for the same
seven categories the driver greps (internal imports/URLs/packages/
buckets, slack short-links, API keys, internal env vars) and — unlike
the driver's artifact — stamps the output with a run timestamp and the
scanned commit hash, so each result is verifiably fresh (ADVICE.md,
round 6, item 3).

Usage: python3 tools/leakcheck.py [repo-root]   (default: script's ../)
Writes LEAKCHECK_LOCAL.json at the repo root; exits non-zero on any hit.
"""
import json
import os
import re
import subprocess
import sys
import time

root = os.path.abspath(
    sys.argv[1] if len(sys.argv) > 1 else os.path.join(os.path.dirname(__file__), ".."))

# Category -> regex. Deliberately broad: anything that smells like a
# non-public system. False positives are cheap (a human reads the list);
# false negatives are what the gate exists to prevent.
PATTERNS = {
    "internal-import": r"(?:import|from)\s+(?:com\.anthropic|anthropic[._]internal|kin_internal)",
    "internal-url": r"https?://[a-z0-9.-]*\b(?:internal|corp|intranet)\b[a-z0-9.-]*/",
    "internal-pkg2": r'"(?:@anthropic|@kin-internal)/',
    "internal-bucket": r"(?:s3|gs|wasb|abfss)://[a-z0-9.-]*\b(?:internal|prod|corp)\b",
    "slack-link": r"\bgo/[a-z][a-z0-9-]+\b|slack\.com/archives",
    "api-key": r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,})",
    "axon-env": r"\b[A-Z_]*(?:AXON|SNOWFLAKE_ACCOUNT|COINGECKO_KEY)[A-Z_]*\s*=",
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md", "COVERAGE.md", "SURVEY.md"]
SKIP_EXT = {".class", ".jar", ".parquet", ".crc", ".png", ".gif", ".jpg"}


def files():
    for d in SCAN_DIRS:
        for dirpath, dirnames, filenames in os.walk(os.path.join(root, d)):
            dirnames[:] = [x for x in dirnames if x != "target"]
            for f in filenames:
                if os.path.splitext(f)[1] not in SKIP_EXT:
                    yield os.path.join(dirpath, f)
    for f in SCAN_FILES:
        p = os.path.join(root, f)
        if os.path.exists(p):
            yield p


hits = {k: [] for k in PATTERNS}
compiled = {k: re.compile(v) for k, v in PATTERNS.items()}
for path in files():
    try:
        with open(path, errors="replace") as fh:
            for lineno, line in enumerate(fh, 1):
                for cat, rx in compiled.items():
                    if rx.search(line):
                        rel = os.path.relpath(path, root)
                        hits[cat].append(f"{rel}:{lineno}: {line.strip()[:160]}")
    except OSError:
        pass

commit = subprocess.run(
    ["git", "-C", root, "rev-parse", "HEAD"],
    capture_output=True, text=True).stdout.strip()
dirty = bool(subprocess.run(
    ["git", "-C", root, "status", "--porcelain"],
    capture_output=True, text=True).stdout.strip())

out = {
    "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "scanned_commit": commit + ("+dirty" if dirty else ""),
    "n_files": sum(1 for _ in files()),
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
}
dest = os.path.join(root, "LEAKCHECK_LOCAL.json")
with open(dest, "w") as fh:
    json.dump(out, fh, indent=2)
print(f"leakcheck: {out['n_hits']} hits over {out['n_files']} files "
      f"@ {out['scanned_commit'][:12]} -> {dest}")
sys.exit(1 if out["n_hits"] else 0)
