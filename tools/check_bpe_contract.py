#!/usr/bin/env python3
"""Cross-engine BPE contract property check.

Generates random (merges table, texts) cases — alphabets include spaces,
punctuation, accented chars, a combining mark, and a non-BMP emoji — runs
graft.text.BpeCore (via tools/DumpBpe, one JVM for all cases) and the same
DuckDB recursive-CTE replay the driver oracle uses, and diffs the full
token sequences. Any divergence in pre-tokenization, codepoint
symbolization, merge order, or splice arithmetic fails loudly.

Usage: python3 tools/check_bpe_contract.py [nCases] [seed]
"""
import random
import subprocess
import sys
import tempfile

import duckdb

N_CASES = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 7
rng = random.Random(SEED)

ALPHAS = [
    "abcd",
    "ab c.d",              # spaces + punctuation
    "a1b2 ,;",             # digits + punct runs
    "abé́ c",    # accented + combining acute
    "ab\U0001F600 c",      # non-BMP emoji
]

US, RS = chr(31), chr(30)


def gen_case():
    alpha = rng.choice(ALPHAS)
    cps = [c for c in alpha]  # python iterates codepoints natively

    def sym():
        return "".join(rng.choice(cps) for _ in range(rng.randint(1, 2)))

    merges, seen = [], set()
    for _ in range(rng.randint(1, 14)):
        p = (sym(), sym())
        if p not in seen and US not in p[0] + p[1] and "\x00" not in p[0] + p[1]:
            seen.add(p)
            merges.append(p)
    texts = []
    for _ in range(rng.randint(1, 6)):
        t = "".join(rng.choice(cps) for _ in range(rng.randint(0, 24)))
        t = t.replace("\t", " ").replace("\n", " ")
        texts.append(t)
    return merges, texts


def duck_tokens(merges, texts):
    con = duckdb.connect()

    def q(s):
        return "'" + s.replace("'", "''") + "'"

    mvals = ", ".join(f"({q(l)},{q(r)},{i})" for i, (l, r) in enumerate(merges))
    dvals = ", ".join(f"({i},{q(t)})" for i, t in enumerate(texts))
    sql = f"""
WITH RECURSIVE
m(lhs, rhs, rnk) AS (VALUES {mvals}),
docs(doc_id, text) AS (VALUES {dvals}),
pre AS (SELECT doc_id, regexp_extract_all(coalesce(text, ''),
  ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s') AS ws FROM docs),
occ AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS widx FROM pre),
vocab AS (SELECT DISTINCT tok FROM occ),
steps(tok, s) AS (
  SELECT tok, chr(31) || array_to_string(string_split(tok, ''), chr(31)) || chr(31) FROM vocab
  UNION ALL
  SELECT tok, substr(s, 1, idx - 1) || chr(31) || lhs || rhs || chr(31)
    || substr(s, idx + length(chr(31) || lhs || chr(31) || rhs || chr(31)))
  FROM (SELECT st.tok, st.s, best.lhs, best.rhs,
      strpos(st.s, chr(31) || best.lhs || chr(31) || best.rhs || chr(31)) AS idx
    FROM steps st, LATERAL (SELECT m.lhs, m.rhs FROM m
      WHERE strpos(st.s, chr(31) || m.lhs || chr(31) || m.rhs || chr(31)) > 0
      ORDER BY m.rnk LIMIT 1) AS best) t),
fin AS (SELECT tok, s FROM steps t WHERE NOT EXISTS (SELECT 1 FROM m
  WHERE strpos(t.s, chr(31) || m.lhs || chr(31) || m.rhs || chr(31)) > 0)),
tokstr AS (SELECT tok, replace(substr(s, 2, length(s) - 2), chr(31), chr(30)) AS toks FROM fin),
perdoc AS (SELECT o.doc_id, string_agg(ts.toks, chr(30) ORDER BY o.widx) AS toks
  FROM occ o JOIN tokstr ts USING (tok) GROUP BY o.doc_id)
SELECT d.doc_id, coalesce(p.toks, '') FROM docs d LEFT JOIN perdoc p USING (doc_id)
ORDER BY d.doc_id
"""
    return [row[1] for row in con.sql(sql).fetchall()]


def main():
    cases = [gen_case() for _ in range(N_CASES)]
    # BpeCore is pure Scala (no Spark session), so each case runs as a
    # plain `java -cp` invocation (~0.5 s) against sbt's compiled classes —
    # the classpath is exported once
    cp = subprocess.run(
        ["sbt", "-batch", "export Runtime/fullClasspath"],
        cwd="/root/repo", capture_output=True, text=True, timeout=600)
    classpath = [l for l in cp.stdout.splitlines() if ".jar" in l or "classes" in l][-1]
    failures = 0
    for ci, (merges, texts) in enumerate(cases):
        with tempfile.NamedTemporaryFile("w", suffix=".bpe", delete=False,
                                         encoding="utf-8") as f:
            f.write(f"{len(merges)}\n")
            for l, r in merges:
                f.write(f"{l}\t{r}\n")
            for t in texts:
                f.write(t + "\n")
            path = f.name
        r = subprocess.run(
            ["java", "-cp", classpath, "graft.tools.DumpBpe", path],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            print(f"case {ci}: DumpBpe failed: {r.stderr[-500:]}")
            failures += 1
            continue
        # NOT splitlines(): python treats U+001E (our token separator) as a
        # line boundary
        got = r.stdout.split("\n")
        if got and got[-1] == "":
            got = got[:-1]
        want = duck_tokens(merges, texts)
        for ti, (g, w) in enumerate(zip(got, want)):
            if g != w:
                failures += 1
                print(f"case {ci} text {ti}: MISMATCH\n  merges={merges}"
                      f"\n  text={texts[ti]!r}\n  scala={g!r}\n  duck ={w!r}")
    if failures:
        sys.exit(f"{failures} mismatches across {N_CASES} cases")
    print(f"{N_CASES} random cases: Scala BpeCore == DuckDB CTE on every token")


if __name__ == "__main__":
    main()
