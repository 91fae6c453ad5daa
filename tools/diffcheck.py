import duckdb, json, sys, glob, os, math
from decimal import Decimal
outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(v):
    if isinstance(v, Decimal): return ('num', float(v))
    if isinstance(v, float):
        return ('num', round(v, 9))
    if isinstance(v, int): return ('num', float(v))
    if isinstance(v, list): return tuple(canon(x) for x in v)
    return v

def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)

fails = []
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p): continue
    files = glob.glob(p + '/*.parquet')
    r = con.sql(f"SELECT * FROM read_parquet({files})")
    scols, srows = [c.lower() for c in r.columns], r.fetchall()
    if name not in oracles:
        print(f"{name:22s} rows-only: {len(srows)} rows")
        continue
    try:
        o = con.sql(oracles[name])
        ocols, orows = [c.lower() for c in o.columns], o.fetchall()
    except Exception as e:
        fails.append(name)
        print(f"{name:22s} FAIL oracle error: {str(e)[:200]}")
        continue
    status = []
    if sorted(scols) != sorted(ocols):
        status.append(f"SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
    elif len(srows) != len(orows):
        status.append(f"ROWCOUNT spark={len(srows)} oracle={len(orows)}")
    else:
        a, b = normalize(srows, scols), normalize(orows, ocols)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:2]
            status.append(f"VALUES diff e.g. {bad}")
    if status:
        fails.append(name)
        print(f"{name:22s} FAIL {status[0][:300]}")
    else:
        print(f"{name:22s} OK   ({len(srows)} rows)")
print("\nFAILED:", fails if fails else "none")
