#!/usr/bin/env python3
"""A/B two oracle_sql.json renderings in DuckDB over the same sf dir:
for every query whose SQL text differs, run BOTH and assert the result
frames are value- and dtype-identical. The round-10 discipline for
oracle reformulations — run at sf0.01 AND sf0.1 before trusting a
rewrite. Usage: ab_sql.py <sfDir> <old.json> <new.json> [query...]"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, old_p, new_p = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4:])
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute(f"SET temp_directory="
                f"'{os.path.join(os.path.dirname(old_p), '.abtmp')}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_ok = n_bad = 0
    # A renamed or dropped oracle must not pass silently: surface keys
    # present on only one side (advisor r11), and fail if the selection
    # compared nothing at all.
    for name in sorted(set(old) - set(new)):
        print(f"WARN {name}: in old.json only (dropped or renamed)")
    for name in sorted(set(new) - set(old)):
        print(f"WARN {name}: in new.json only (not compared)")
    for name in sorted(old):
        if name not in new or old[name] == new[name]:
            continue
        if only and name not in only:
            continue
        a = con.execute(old[name]).fetchdf()
        b = con.execute(new[name]).fetchdf()
        a = a.reindex(sorted(a.columns), axis=1)
        b = b.reindex(sorted(b.columns), axis=1)
        bad = []
        if list(a.columns) != list(b.columns):
            bad.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            bad.append(f"rows {len(a)} vs {len(b)}")
        else:
            a_s = a.sort_values(list(a.columns)).reset_index(drop=True)
            b_s = b.sort_values(list(b.columns)).reset_index(drop=True)
            for c in a.columns:
                x, y = a_s[c], b_s[c]
                if str(x.dtype) != str(y.dtype):
                    bad.append(f"{c}: dtype {x.dtype} vs {y.dtype}")
                elif not x.equals(y):
                    d = (x != y) & ~(x.isna() & y.isna())
                    if d.any():
                        i = d.idxmax()
                        bad.append(f"{c}: {int(d.sum())} diffs,"
                                   f" first@{i}: {x[i]!r} vs {y[i]!r}")
                    else:
                        # Series.equals is False but no elementwise diff:
                        # NA representation mismatch (None vs NaN).
                        bad.append(f"{c}: values differ per Series.equals"
                                   f" (NA representation?)")
        if bad:
            print(f"DIFF {name}: " + "; ".join(bad)); n_bad += 1
        else:
            print(f"same {name} ({len(a)} rows)"); n_ok += 1
    if n_ok == 0 and n_bad == 0:
        print("== NOTHING COMPARED (no query differed between the two"
              " renderings, or the filter matched none) ==")
    print(f"== {n_ok} identical, {n_bad} diff ==")
    sys.exit(1 if n_bad else 0)


main()
