#!/usr/bin/env python3
"""Prototype: unigram-LM tokenizer (hard-EM / Viterbi variant) with
integer milli-log2 costs, plus the generated DuckDB oracle SQL.
Checks reference-python vs generated-SQL equality on the real corpus."""
import duckdb, math, re, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
SEED_MULTI = 96     # top-K multi-char seed tokens
ROUNDS = 3          # prune-and-rescore rounds
MAXTOK = 4          # max token length
CHUNK = 16          # word chunk cap
KEEP_NUM, KEEP_DEN = 2, 3   # keep ceil(2/3 * multi) per round

# ---- fixed-point milli-log2 (mirror of EntropyKernels.l) ----
ML = [math.floor(1000.0 * math.log1p(i / 1024.0) / math.log(2.0)) for i in range(1024)]
def l(x):
    k = x.bit_length() - 1
    return 1000 * k + ML[((x << 10) >> k) - 1024]

def norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip(" ")

# ---- reference trainer ----
def chunks(w):
    return [w[i:i+CHUNK] for i in range(0, len(w), CHUNK)]

def viterbi(w, cost):
    # dp[j] = (c, n, toks)
    dp = [None] * (len(w) + 1)
    dp[0] = (0, 0, ())
    for j in range(1, len(w) + 1):
        best = None
        for ln in range(1, min(MAXTOK, j) + 1):
            tok = w[j-ln:j]
            if tok in cost and dp[j-ln] is not None:
                c0, n0, t0 = dp[j-ln]
                cand = (c0 + cost[tok], n0 + 1, t0 + (tok,))
                if best is None or cand < best:
                    best = cand
        dp[j] = best
    return dp[len(w)][2]

def train(word_counts):
    # word_counts: {chunked word: count}
    sub = {}
    singles = set()
    for w, c in word_counts.items():
        for i in range(len(w)):
            singles.add(w[i])
            for ln in range(1, min(MAXTOK, len(w)-i) + 1):
                s = w[i:i+ln]
                sub[s] = sub.get(s, 0) + c
    multi = sorted((s for s in sub if len(s) >= 2),
                   key=lambda s: (-sub[s], s))[:SEED_MULTI]
    vocab = {s: sub[s] for s in singles}
    vocab.update({s: sub[s] for s in multi})
    N = sum(vocab.values())
    cost = {t: l(N) - l(c) for t, c in vocab.items()}
    usage = None
    for r in range(ROUNDS):
        usage = {t: 0 for t in cost}
        for w, c in word_counts.items():
            for t in viterbi(w, cost):
                usage[t] += c
        multi_now = [t for t in cost if len(t) >= 2]
        keep_n = -(-len(multi_now) * KEEP_NUM // KEEP_DEN)  # ceil
        kept_multi = sorted(multi_now, key=lambda t: (-usage[t], t))[:keep_n]
        kept = [t for t in cost if len(t) == 1] + kept_multi
        cnt = {t: usage[t] + 1 for t in kept}
        N = sum(cnt.values())
        cost = {t: l(N) - l(cnt[t]) for t in kept}
    return cost, {t: usage[t] for t in cost}

# ---- run reference on corpus ----
con = duckdb.connect()
rows = con.execute(
    f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id").fetchall()
wc = {}
for _, t in rows:
    for w in re.findall(r"[a-z0-9]+", norm(t)):
        for ch in chunks(w):
            wc[ch] = wc.get(ch, 0) + 1
cost, usage = train(wc)
multi_sorted = sorted(t for t in cost if len(t) >= 2)
tid = {t: 0x110000 + i for i, t in enumerate(multi_sorted)}
for t in cost:
    if len(t) == 1:
        tid[t] = ord(t)
vocab_rows = sorted((tid[t], t, cost[t], usage[t]) for t in cost)
print(f"ref vocab: {len(vocab_rows)} tokens "
      f"({len(multi_sorted)} multi), sample: {vocab_rows[:3]} ... {vocab_rows[-3:]}")

# per-doc encode (token pattern: alnum runs + single non-space marks)
TOKPAT = r"[a-z0-9]+|[^a-z0-9 ]"
enc_rows = []
for did, t in rows:
    ids = []
    for w in re.findall(TOKPAT, norm(t)):
        if re.fullmatch(r"[a-z0-9]+", w):
            for ch in chunks(w):
                ids += [tid[x] for x in viterbi(ch, cost)]
        else:
            ids.append(ord(w))
    enc_rows.append((did, len(ids), " ".join(map(str, ids))))
print("ref encode sample:", enc_rows[0][:2], enc_rows[0][2][:60])

# ---- generated oracle SQL ----
def milli_log_sql(x):
    k = f"(length(format('{{:b}}', {x})) - 1)"
    return (f"(1000 * {k} + list_extract((SELECT v FROM ml), "
            f"CAST((({x}) * 1024) // (1::BIGINT << {k}) - 1023 AS INT)))")

ML_CTE = "ml AS (SELECT " + str(ML).replace("[", "[", 1) + "::BIGINT[] AS v)"
NORM = ("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')")

def dp_chain(rnd, vocab_cte):
    """16 dp CTEs segmenting every chunked word under vocab_cte(tok, cost);
    returns (cte_sql, seg_cte_name)."""
    ctes = [f"dp{rnd}_0 AS MATERIALIZED (SELECT w, n, "
            f"{{'c': 0::BIGINT, 'n': 0::BIGINT, 't': []::VARCHAR[]}} AS s FROM cw)"]
    for j in range(1, CHUNK + 1):
        cands = []
        for ln in range(1, min(MAXTOK, j) + 1):
            cands.append(
                f"SELECT p.w, p.n, {{'c': p.s.c + v.cost, 'n': p.s.n + 1, "
                f"'t': list_append(p.s.t, v.tok)}} AS s "
                f"FROM dp{rnd}_{j-ln} p JOIN {vocab_cte} v "
                f"ON v.tok = substr(p.w, {j-ln+1}, {ln}) WHERE p.n >= {j}")
        ctes.append(f"dp{rnd}_{j} AS MATERIALIZED (SELECT w, n, min(s) AS s FROM "
                    f"({' UNION ALL '.join(cands)}) GROUP BY w, n)")
    segs = " UNION ALL ".join(
        f"SELECT w, n, s.t AS toks FROM dp{rnd}_{j} WHERE n = {j}"
        for j in range(1, CHUNK + 1))
    ctes.append(f"seg{rnd} AS MATERIALIZED ({segs})")
    return ",\n".join(ctes), f"seg{rnd}"

parts = [ML_CTE]
# chunked distinct word counts
parts.append(f"""wq AS (SELECT unnest(regexp_extract_all({NORM}, '[a-z0-9]+')) AS fw
  FROM documents)""")
parts.append(f"""cw AS MATERIALIZED (
  SELECT w, CAST(length(w) AS BIGINT) AS n, count(*)::BIGINT AS c FROM (
    SELECT substr(fw, CAST(i AS INT) * {CHUNK} + 1, {CHUNK}) AS w
    FROM wq, LATERAL unnest(range(0, (length(fw) + {CHUNK - 1}) // {CHUNK})) AS t(i))
  GROUP BY 1, 2)""")
# seed: per-position substrings weighted by c
parts.append(f"""sub AS MATERIALIZED (
  SELECT s, sum(c)::BIGINT AS cnt FROM (
    SELECT substr(w, CAST(i AS INT), CAST(ln AS INT)) AS s, c
    FROM cw, LATERAL unnest(range(1, CAST(n AS INT) + 1)) AS t(i),
         LATERAL unnest(range(1, least({MAXTOK}, CAST(n AS INT) - CAST(i AS INT) + 1) + 1)) AS t2(ln))
  GROUP BY 1)""")
parts.append(f"""seedv AS MATERIALIZED (
  SELECT s AS tok, cnt FROM sub WHERE length(s) = 1
  UNION ALL
  SELECT s, cnt FROM (SELECT s, cnt FROM sub WHERE length(s) >= 2
    ORDER BY cnt DESC, s ASC LIMIT {SEED_MULTI}))""")
parts.append(f"""n0 AS (SELECT sum(cnt)::BIGINT AS nn FROM seedv),
v0 AS MATERIALIZED (SELECT tok,
  CAST({milli_log_sql('(SELECT nn FROM n0)')} - {milli_log_sql('cnt')} AS BIGINT) AS cost
  FROM seedv)""")
prev_v = "v0"
for r in range(1, ROUNDS + 1):
    dp_sql, seg = dp_chain(r, prev_v)
    parts.append(dp_sql)
    parts.append(f"""u{r} AS MATERIALIZED (
  SELECT vv.tok, COALESCE(uu.u, 0)::BIGINT AS u
  FROM {prev_v} vv LEFT JOIN (
    SELECT t.tok, sum(cw.c)::BIGINT AS u
    FROM {seg} sg JOIN cw ON cw.w = sg.w AND cw.n = sg.n,
         LATERAL unnest(sg.toks) AS t(tok)
    GROUP BY 1) uu ON uu.tok = vv.tok)""")
    # prune + rescore
    parts.append(f"""k{r} AS MATERIALIZED (
  SELECT tok, u FROM u{r} WHERE length(tok) = 1
  UNION ALL
  SELECT tok, u FROM (
    SELECT tok, u, row_number() OVER (ORDER BY u DESC, tok ASC) AS rn,
      (SELECT count(*) FROM u{r} WHERE length(tok) >= 2) AS m
    FROM u{r} WHERE length(tok) >= 2)
  WHERE rn <= (m * {KEEP_NUM} + {KEEP_DEN - 1}) // {KEEP_DEN})""")
    parts.append(f"""n{r} AS (SELECT sum(u + 1)::BIGINT AS nn FROM k{r}),
v{r} AS MATERIALIZED (SELECT tok,
  CAST({milli_log_sql(f'(SELECT nn FROM n{r})')} - {milli_log_sql('(u + 1)')} AS BIGINT) AS cost
  FROM k{r})""")
    prev_v = f"v{r}"

vocab_sql = "WITH " + ",\n".join(parts) + f""",
idm AS (SELECT tok, 1114111 + row_number() OVER (ORDER BY tok ASC) AS id
        FROM {prev_v} WHERE length(tok) >= 2)
SELECT CAST(COALESCE(idm.id, unicode(v.tok)) AS BIGINT) AS token_id,
  v.tok AS token, v.cost AS milli_cost, u.u AS n_uses
FROM {prev_v} v JOIN u{ROUNDS} u USING (tok)
LEFT JOIN idm ON idm.tok = v.tok"""

con2 = duckdb.connect()
con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
got = con2.execute(vocab_sql).fetchall()
got_rows = sorted(got)
ref_rows = vocab_rows
print(f"sql vocab: {len(got_rows)} rows")
if got_rows == [(a, b, c, d) for a, b, c, d in ref_rows]:
    print("VOCAB MATCH")
else:
    print("VOCAB MISMATCH")
    gs, rs = set(got_rows), set((a,b,c,d) for a,b,c,d in ref_rows)
    print("only sql:", sorted(gs - rs)[:5])
    print("only ref:", sorted(rs - gs)[:5])

# ---- encode oracle: final dp chain under the trained vocab ----
dp_sql, seg = dp_chain(ROUNDS + 1, prev_v)
enc_parts = parts + [dp_sql]
enc_parts.append(f"""idm AS (SELECT tok, 1114111 + row_number() OVER (ORDER BY tok ASC) AS id
  FROM {prev_v} WHERE length(tok) >= 2)""")
# doc pretokens in order -> chunked -> per-chunk token list -> ids
enc_parts.append(f"""dtok AS (SELECT doc_id, CAST(i AS INT) AS wpos,
    list_extract(ws, CAST(i AS INT)) AS fw
  FROM (SELECT doc_id, regexp_extract_all({NORM}, '[a-z0-9]+|[^a-z0-9 ]') AS ws
        FROM documents),
       LATERAL unnest(range(1, len(ws) + 1)) AS t(i))""")
enc_parts.append(f"""dchunk AS (SELECT doc_id, wpos, CAST(ci AS INT) AS cpos,
    substr(fw, CAST(ci AS INT) * {CHUNK} + 1, {CHUNK}) AS w,
    fw ~ '[a-z0-9]+' AS alnum
  FROM dtok, LATERAL unnest(range(0, CASE WHEN fw ~ '[a-z0-9]+'
    THEN (length(fw) + {CHUNK - 1}) // {CHUNK} ELSE 1 END)) AS t(ci))""")
enc_parts.append(f"""dtoks AS (SELECT doc_id, wpos, cpos,
    CASE WHEN alnum THEN sg.toks ELSE [dchunk.w] END AS toks
  FROM dchunk LEFT JOIN {seg} sg
    ON alnum AND sg.w = dchunk.w AND sg.n = length(dchunk.w))""")
enc_parts.append(f"""tid AS (SELECT doc_id, wpos, cpos, CAST(i AS INT) AS spos,
    CASE WHEN length(t) = 1 AND idm.id IS NULL THEN unicode(t) ELSE idm.id END AS id
  FROM (SELECT doc_id, wpos, cpos, CAST(i AS INT) AS i,
          list_extract(toks, CAST(i AS INT)) AS t
        FROM dtoks, LATERAL unnest(range(1, len(toks) + 1)) AS t2(i)) x
  LEFT JOIN idm ON idm.tok = x.t)""")
enc_sql = "WITH " + ",\n".join(enc_parts) + """
SELECT d.doc_id, CAST(count(t.id) AS BIGINT) AS n_tokens,
  coalesce(string_agg(CAST(t.id AS VARCHAR), ' '
    ORDER BY t.wpos, t.cpos, t.spos), '') AS token_ids
FROM documents d LEFT JOIN tid t USING (doc_id)
GROUP BY 1"""
got_enc = sorted(con2.execute(enc_sql).fetchall())
ref_enc = sorted(enc_rows)
print(f"sql encode: {len(got_enc)} rows")
if got_enc == ref_enc:
    print("ENCODE MATCH")
else:
    print("ENCODE MISMATCH")
    for a, b in zip(ref_enc, got_enc):
        if a != b:
            print("ref:", a[:2], a[2][:80])
            print("sql:", b[:2], b[2][:80])
            break
