import duckdb, json, glob, sys, math
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = pd.read_parquet(glob.glob(f'{out}/{name}/*.parquet')[0] if glob.glob(f'{out}/{name}/*.parquet') else f'{out}/{name}')
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        # normalize dtypes for compare
        if len(exp) != len(got):
            print(f'FAIL {name}: rows exp={len(exp)} got={len(got)}'); fail += 1; continue
        mism = []
        for c in exp.columns:
            if c not in got.columns:
                mism.append(f'missing col {c}'); continue
            e, g = exp[c], got[c]
            try:
                same = (e.astype(str) == g.astype(str)).all()
            except Exception as ex:
                same = False
            if not same:
                mism.append(c)
        if mism:
            print(f'FAIL {name}: col mismatch {mism}')
            for c in mism[:1]:
                diff = (exp[c].astype(str) != got[c].astype(str))
                print('  first diffs:', exp[diff][c].head(3).tolist(), 'vs', got[diff][c].head(3).tolist())
            fail += 1
        else:
            print(f'OK   {name}: {len(exp)} rows'); ok += 1
    except Exception as ex:
        print(f'ERR  {name}: {ex}'); fail += 1
print(f'== {ok} ok, {fail} fail ==')
