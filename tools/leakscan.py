#!/usr/bin/env python3
"""Repo-side leak self-scan with a verifiable run stamp.

The round artifact LEAKCHECK.json is produced outside this repo and carries
no timestamp or file count, so two rounds' copies are indistinguishable
except for the round number. This tool produces the stamped counterpart:
it scans every tracked source/doc file for categories of strings that have
no business in a from-public-knowledge codebase and writes a JSON artifact
carrying WHEN it ran, WHAT it scanned (file count + git head), and what it
found — so "zero hits" is a checkable claim, not a stale copy.

Usage: python3 tools/leakscan.py [out.json]   (run from the repo root)
"""
import datetime
import json
import re
import subprocess
import sys

# Domains a Spark/DuckDB/Scala project legitimately references.
PUBLIC_DOMAINS = re.compile(
    r"(apache\.org|github\.com|scala-lang\.org|duckdb\.org|scala-sbt\.org|"
    r"w3\.org|example\.com|json\.org|wikipedia\.org|arxiv\.org|acm\.org|"
    r"localhost|127\.0\.0\.1)")

CHECKS = {
    # any URL whose domain is not on the public allowlist
    "unknown-url": re.compile(r"https?://[A-Za-z0-9.-]+"),
    # object-store buckets: none should exist — all data paths are local
    "bucket-uri": re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[A-Za-z0-9._/-]+"),
    # chat webhooks / workspace links
    "chat-link": re.compile(r"(hooks\.slack\.com|\.slack\.com/|discord\.com/api/webhooks)"),
    # AWS-style access key ids and generic assigned secrets
    "api-key": re.compile(r"(AKIA[0-9A-Z]{16}|(?:[Aa][Pp][Ii][_-]?[Kk][Ee][Yy]|[Ss][Ee][Cc][Rr][Ee][Tt]|[Tt][Oo][Kk][Ee][Nn])\s*[:=]\s*['\"][A-Za-z0-9+/]{20,}['\"])"),
    # env vars read by the build/code outside the expected set
    "env-var": re.compile(r"sys\.env(?:\.getOrElse)?\(\"([A-Z0-9_]+)\""),
}
ENV_ALLOW = re.compile(r"^(SPARK_|COURSIER_|JAVA_|SBT_|HOME$|PATH$|USER$|TMPDIR$)")

# Benign, documented citations: the public reference repo's own staging
# bucket path, quoted in SURVEY.md's architecture survey of that repo.
TOKEN_ALLOW = {"s3a://dwp/staging/"}


def main(out_path):
    # -z: NUL-delimited, so paths with spaces/newlines survive; a skipped
    # (unreadable) file is RECORDED and fails the scan — a coverage tool
    # must never claim "clean" over files it did not read.
    files = [f for f in subprocess.run(
        ["git", "ls-files", "-z", "src", "tools", "build.sbt", "*.md"],
        capture_output=True, text=True, check=True).stdout.split("\0") if f]
    hits = {k: [] for k in CHECKS}
    skipped = []
    n_files = 0
    for f in files:
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError as e:
            skipped.append(f"{f}: {e}")
            continue
        n_files += 1
        for lineno, line in enumerate(text.splitlines(), 1):
            for name, rx in CHECKS.items():
                for m in rx.finditer(line):
                    tok = m.group(0)
                    if tok in TOKEN_ALLOW:
                        continue
                    if name == "unknown-url" and PUBLIC_DOMAINS.search(tok):
                        continue
                    if name == "env-var" and ENV_ALLOW.match(m.group(1)):
                        continue
                    hits[name].append(f"{f}:{lineno}: {tok[:120]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    out = {
        "generatedAt": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "git_head": head,
        "files_scanned": n_files,
        "files_skipped": skipped,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(out_path, "w") as fp:
        json.dump(out, fp, indent=2)
        fp.write("\n")
    print(f"leakscan: {n_files} files, {out['n_hits']} hits, "
          f"{len(skipped)} skipped -> {out_path}")
    return 0 if out["n_hits"] == 0 and not skipped else 1


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "LEAKSCAN.json"
    if arg.startswith("-"):
        # An option-like argument is a usage request or a typo, never an
        # output path: round 19 ran `leakscan.py --help` and committed a
        # stray report literally named `--help`, which the next scan then
        # counted among its own scanned files.
        print(__doc__.strip())
        sys.exit(0 if arg in ("-h", "--help") else 2)
    sys.exit(main(arg))
