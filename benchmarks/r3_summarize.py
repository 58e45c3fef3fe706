"""Compact view of an r3_campaign.log: per stage, the result lines.

    python benchmarks/r3_summarize.py [benchmarks/results/r3_campaign.log]

Keeps lines that carry numbers a winner-pick needs (ms / ex/s / JSON /
AUC / rc markers) and drops compile spew, so a 25-stage campaign reads in
one screen."""
import re
import sys

KEEP = re.compile(
    r"(=== \[|\bms\b|ex/s|examples/s|\"metric\"|AUC|maxerr|rc=|"
    r"throughput|OOM|Error|error:|FAILED|Traceback)")
SKIP = re.compile(r"(Platform 'axon'|WARNING:|compil|XLA_FLAGS)")


def main(path):
    with open(path, errors="replace") as f:
        for line in f:
            if SKIP.search(line):
                continue
            if KEEP.search(line):
                print(line.rstrip())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "benchmarks/results/r3_campaign.log")
