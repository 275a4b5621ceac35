#!/usr/bin/env python3
"""Shared parsing for the round-14 SparkEntry split: extract the queries
map entries, the oracleSql map entries, and the helper regions from
SparkEntry.scala, preserving every line verbatim."""
import re
from pathlib import Path

SRC = Path("/root/repo/src/main/scala/graft/SparkEntry.scala")

ENTRY_RE = re.compile(r'^    "(q\d+[a-z0-9_]*)" ->')


def parse():
    lines = SRC.read_text().splitlines()
    # locate regions
    q_start = next(i for i, l in enumerate(lines)
                   if l.startswith("  def queries:"))
    o_start = next(i for i, l in enumerate(lines)
                   if l.startswith("  def oracleSql:"))
    # queries map closes at the last line before the first top-level
    # member after it (the mid region) — find the `  )` line that closes
    # the Map( opened on q_start, by tracking paren depth.
    def map_close(start):
        depth = 0
        for i in range(start, len(lines)):
            # strings can contain parens; crude but the file is regular:
            # count parens outside of string literals per line.
            s = strip_strings(lines[i])
            depth += s.count("(") - s.count(")")
            if depth == 0 and i > start:
                return i
        raise AssertionError("unclosed map from line %d" % start)

    def strip_strings(s):
        # remove """...""" fragments and "..." fragments (single-line
        # approximations — multi-line raw strings handled by the
        # in-string state machine below)
        return re.sub(r'"([^"\\]|\\.)*"', '""', s)

    # robust paren tracking with triple-quote awareness; counting starts
    # at the trailing `Map(` of the signature line so the signature's own
    # parameter-list parens don't close the scan early
    def map_close2(start):
        depth = 0
        in_triple = False
        for i in range(start, len(lines)):
            line = lines[i]
            j = line.rindex("Map(") if i == start else 0
            while j < len(line):
                if in_triple:
                    k = line.find('"""', j)
                    if k == -1:
                        j = len(line)
                    else:
                        in_triple = False
                        j = k + 3
                    continue
                if line.startswith('"""', j):
                    in_triple = True
                    j += 3
                    continue
                c = line[j]
                if c == '"':
                    # single-line string literal
                    k = j + 1
                    while k < len(line):
                        if line[k] == "\\":
                            k += 2
                            continue
                        if line[k] == '"':
                            break
                        k += 1
                    j = k + 1
                    continue
                if c == "'":
                    # char literal like '(' — skip it
                    if j + 2 < len(line) and line[j + 2] == "'":
                        j += 3
                        continue
                if c == "/" and j + 1 < len(line) and line[j + 1] == "/":
                    j = len(line)
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        return i
                j += 1
        raise AssertionError("unclosed map from line %d" % start)

    q_close = map_close2(q_start)
    o_close = map_close2(o_start)

    def split_entries(start, close):
        """Return (entries: list[(qid, lines)], preamble_lines)."""
        entries = []
        buf = []  # pending comments/blank lines
        cur = None  # (qid, lines)
        for i in range(start + 1, close):
            line = lines[i]
            m = ENTRY_RE.match(line)
            if m:
                if cur:
                    entries.append(cur)
                cur = (m.group(1), buf + [line])
                buf = []
            elif line.strip().startswith("//") or line.strip() == "":
                buf.append(line)
            else:
                if cur is None:
                    raise AssertionError("orphan line %d: %r" % (i, line))
                cur = (cur[0], cur[1] + buf + [line])
                buf = []
        if cur:
            entries.append(cur)
        assert not [l for l in buf if l.strip()], "trailing junk: %r" % buf
        return entries

    q_entries = split_entries(q_start, q_close)
    o_entries = split_entries(o_start, o_close)

    header = lines[:q_start]          # file head incl. helpers, up to def queries
    mid = lines[q_close + 1:o_start]  # helpers between the two maps
    while lines and lines[-1].strip() == "":
        lines.pop()
    tail = lines[o_close + 1:-1]      # helpers after oracleSql map (sans final })
    assert lines[-1] == "}"
    return {
        "lines": lines,
        "header": header,
        "mid": mid,
        "tail": tail,
        "q_entries": q_entries,
        "o_entries": o_entries,
        "q_sig": lines[q_start],
        "o_sig": lines[o_start],
    }


if __name__ == "__main__":
    p = parse()
    print("queries entries:", len(p["q_entries"]))
    print("oracle entries:", len(p["o_entries"]))
    print("header:", len(p["header"]), "mid:", len(p["mid"]),
          "tail:", len(p["tail"]))
    qids = [q for q, _ in p["q_entries"]]
    oids = [q for q, _ in p["o_entries"]]
    print("dup qids:", [q for q in set(qids) if qids.count(q) > 1])
    print("queries-without-oracle:", sorted(set(qids) - set(oids)))
    print("oracle-without-query:", sorted(set(oids) - set(qids)))
