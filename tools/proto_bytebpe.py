#!/usr/bin/env python3
"""Prototype of the byte-level BPE contract (VERDICT r17 item 3) —
reference implementation vs the generated DuckDB oracle SQL, checked
hash-exact on the real corpus BEFORE any Scala is written (the
proto_unigram.py discipline).

Byte-level BPE, the GPT-2/tiktoken family: pretokens are maximal
non-space runs of the normalized text; each pretoken becomes its UTF-8
bytes mapped through the (public, deterministic) GPT-2 byte-to-unicode
table so every byte is a printable single char; then the exact char-BPE
merge loop (count adjacent pairs over the distinct-pretoken frequency
table, merge argmax (count desc, pair asc), greedy left-to-right
replace) runs over the mapped alphabet. Any input tokenizes with zero
OOV. Symbol encodings use chr(324)/chr(325) as the bracket pair (the
char-BPE '(' ')' trick) because the mapped alphabet is exactly the 256
GPT-2 chars = {33..126, 161..172, 174..255, 256..323} and 324/325 can
never occur inside a symbol.

Usage: python3 tools/proto_bytebpe.py <sfDir>
"""
import sys, duckdb

ROUNDS = 8
SEPL, SEPR = chr(324), chr(325)

LANGS = ["en", "de", "es", "fr", "it", "pt", "nl", "ru", "ar", "zh", "ja", "ko"]
FIXTURE = [
    ("it was the best of times and it was the worst of times",
     "all the people in the city know about the old stone bridge"),
    ("es war die beste zeit und es war die schlechteste zeit",
     "alle menschen in der stadt kennen die alte steinerne brücke"),
    ("era el mejor de los tiempos y era el peor de los tiempos",
     "toda la gente de la ciudad conoce el viejo puente de piedra"),
    ("c'était le meilleur des temps et c'était le pire des temps",
     "tous les gens de la ville connaissent le vieux pont de pierre"),
    ("era il migliore dei tempi ed era il peggiore dei tempi",
     "tutta la gente della città conosce il vecchio ponte di pietra"),
    ("era o melhor dos tempos e era o pior dos tempos",
     "todas as pessoas da cidade conhecem a velha ponte de pedra"),
    ("het was de beste tijd en het was de slechtste tijd",
     "alle mensen in de stad kennen de oude stenen brug"),
    ("это было лучшее время и это было худшее время",
     "все люди в городе знают старый каменный мост"),
    ("كان أفضل الأوقات وكان أسوأ الأوقات",
     "كل الناس في المدينة يعرفون الجسر الحجري القديم"),
    ("这是最好的时代也是最坏的时代",
     "城里所有的人都知道那座古老的石桥"),
    ("それは最高の時代でありまた最悪の時代でもありました",
     "町のすべての人々はその古い石橋を知っています"),
    ("최고의 시절이었고 또한 최악의 시절이었다",
     "도시의 모든 사람들은 그 오래된 돌다리를 알고 있다")]


def byte_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


B2U = byte_to_unicode()


def norm(t):
    import re
    return re.sub(r"\s+", " ", t.strip().lower())


def mapped(word):
    return [B2U[b] for b in word.encode("utf-8")]


# ---------- Python reference ----------

def train(pretok_counts, rounds):
    enc = {w: mapped(w) for w in pretok_counts}
    merges = []
    for _ in range(rounds):
        pairs = {}
        for w, syms in enc.items():
            c = pretok_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in enc.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            enc[w] = out
    return merges, enc


def encode_doc(text, enc_table, vocab):
    ids = []
    for w in norm(text).split(" "):
        if not w:
            continue
        for t in enc_table[w]:
            ids.append(ord(t) if len(t) == 1 else vocab[t])
    return ids


# ---------- generated SQL (the exact string the Scala generator will emit) ----------

def sqlq(s):
    return "'" + s.replace("'", "''") + "'"


def b2u_cte():
    rows = ", ".join(f"('{b:02X}', {sqlq(c)})" for b, c in sorted(B2U.items()))
    return f"b2u(hx, uc) AS (SELECT * FROM (VALUES {rows}) t(hx, uc))"


def byte_bpe_ctes(rounds, rel, text_expr, p=""):
    L, R = SEPL, SEPR
    round_ctes = ",\n".join(f"""{p}p{r} AS MATERIALIZED (
        SELECT list_extract(s, CAST(i AS INT)) AS a,
               list_extract(s, CAST(i AS INT) + 1) AS b, sum(c) AS n
        FROM (SELECT string_split(substr(e, 2, length(e) - 2), '{R}{L}') AS s, c
              FROM {p}e{r - 1}),
             LATERAL unnest(range(1, len(s))) AS t(i)
        GROUP BY 1, 2),
      {p}b{r} AS MATERIALIZED (SELECT a, b FROM {p}p{r}
        ORDER BY n DESC, a ASC, b ASC LIMIT 1),
      {p}e{r} AS MATERIALIZED (SELECT w, c,
        coalesce(replace(e, '{L}' || (SELECT a FROM {p}b{r}) || '{R}{L}' ||
            (SELECT b FROM {p}b{r}) || '{R}',
          '{L}' || (SELECT a || b FROM {p}b{r}) || '{R}'), e) AS e
        FROM {p}e{r - 1})""" for r in range(1, rounds + 1))
    merge_union = " UNION ALL ".join(
        f"SELECT a || b AS tok, 1114111 + {r} AS id FROM {p}b{r}"
        for r in range(1, rounds + 1))
    return f"""{p}wq AS (
        SELECT unnest(regexp_extract_all({text_expr}, '[^ ]+')) AS w FROM {rel}),
      {p}e0 AS MATERIALIZED (
        SELECT w, c, '{L}' || string_agg(uc, '{R}{L}' ORDER BY i) || '{R}' AS e
        FROM (SELECT wc.w, wc.c, t.i, b.uc
              FROM (SELECT w, c, hex(encode(w)) AS hx
                    FROM (SELECT w, count(*) AS c FROM {p}wq GROUP BY 1)) wc,
                   LATERAL unnest(range(0, length(wc.hx) // 2)) AS t(i)
              JOIN b2u b ON b.hx = substr(wc.hx, CAST(t.i * 2 + 1 AS INT), 2))
        GROUP BY w, c),
      {round_ctes},
      {p}vocab AS (SELECT tok, min(id) AS id FROM ({merge_union}) GROUP BY 1),
      {p}dtok AS (SELECT doc_id, CAST(i AS INT) AS wpos,
          list_extract(ws, CAST(i AS INT)) AS w
        FROM (SELECT doc_id, regexp_extract_all({text_expr}, '[^ ]+') AS ws
              FROM {rel}),
             LATERAL unnest(range(1, len(ws) + 1)) AS t(i)),
      {p}tok AS (SELECT doc_id, wpos, CAST(i AS INT) AS spos,
          list_extract(syms, CAST(i AS INT)) AS t
        FROM (SELECT d.doc_id, d.wpos,
                string_split(substr(e.e, 2, length(e.e) - 2), '{R}{L}') AS syms
              FROM {p}dtok d JOIN {p}e{rounds} e ON d.w = e.w),
             LATERAL unnest(range(1, len(syms) + 1)) AS t2(i)),
      {p}tid AS (SELECT doc_id, wpos, spos,
          CASE WHEN length(t) = 1 THEN unicode(t) ELSE v.id END AS id
        FROM {p}tok LEFT JOIN {p}vocab v ON v.tok = {p}tok.t)"""


def lang_fixture_sql():
    def lst(xs):
        return "[" + ", ".join(sqlq(x) for x in xs) + "]"
    flat = [s for pair in FIXTURE for s in pair]
    return f"""SELECT doc_id,
       {lst(LANGS)}[(doc_id % 12) + 1] AS planted_lang,
       {lst(flat)}[((doc_id % 12) * 2 + (doc_id // 12) % 2) + 1] || ' ' ||
       {lst(flat)}[((doc_id % 12) * 2 + 1 - (doc_id // 12) % 2) + 1] AS t
     FROM documents"""


NORM_T = "regexp_replace(lower(trim(t)), '\\s+', ' ', 'g')"


def main():
    sfdir = sys.argv[1]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")

    # the fixture corpus in python
    ids = [r[0] for r in con.execute("SELECT doc_id FROM documents ORDER BY 1").fetchall()]
    flat = [s for pair in FIXTURE for s in pair]
    corpus = {}
    for i in ids:
        li, v = i % 12, (i // 12) % 2
        corpus[i] = (LANGS[li], flat[li * 2 + v] + " " + flat[li * 2 + (1 - v)])

    # python reference
    counts = {}
    for _, (_, t) in corpus.items():
        for w in norm(t).split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    merges, enc = train(counts, ROUNDS)
    vocab = {}
    for r, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, 0x110000 + r)
    ref_vocab = [(r, a, b, a + b) for r, (a, b) in enumerate(merges)]
    ref_enc = {i: encode_doc(t, enc, vocab) for i, (_, t) in corpus.items()}
    ref_fert = {}
    for i, (lang, t) in corpus.items():
        wn = len(norm(t).split(" "))
        d, w, n = ref_fert.get(lang, (0, 0, 0))
        ref_fert[lang] = (d + 1, w + wn, n + len(ref_enc[i]))

    # sql
    ctes = byte_bpe_ctes(ROUNDS, "lf", NORM_T)
    base = f"WITH lf AS ({lang_fixture_sql()}),\n  {b2u_cte()},\n  {ctes}"

    got_vocab = con.execute(base + f"""
      SELECT merge_rank, a, b, a || b FROM (
        {' UNION ALL '.join(f'SELECT {r - 1} AS merge_rank, a, b FROM b{r}' for r in range(1, ROUNDS + 1))})
      ORDER BY 1""").fetchall()
    assert [tuple(r) for r in got_vocab] == ref_vocab, \
        f"vocab mismatch:\nsql {got_vocab}\nref {ref_vocab}"
    print(f"vocab OK ({len(got_vocab)} merges): {[v[3] for v in ref_vocab]}")

    got_enc = dict(con.execute(base + """
      SELECT d.doc_id, coalesce(string_agg(CAST(t.id AS VARCHAR), ' '
          ORDER BY t.wpos, t.spos), '') AS token_ids
      FROM lf d LEFT JOIN tid t USING (doc_id) GROUP BY 1""").fetchall())
    ref_enc_s = {i: " ".join(map(str, v)) for i, v in ref_enc.items()}
    bad = [i for i in ids if got_enc[i] != ref_enc_s[i]]
    assert not bad, f"encode mismatch on {bad[:3]}: sql={got_enc[bad[0]][:90]} ref={ref_enc_s[bad[0]][:90]}"
    print(f"encode OK ({len(ids)} docs)")

    got_fert = {r[0]: (r[1], r[2], r[3]) for r in con.execute(base + f"""
      , wl AS (SELECT doc_id, planted_lang,
          CAST(len(string_split({NORM_T}, ' ')) AS BIGINT) AS w FROM lf),
      nt AS (SELECT wl.doc_id, wl.planted_lang, wl.w, count(t.id) AS n
             FROM wl LEFT JOIN tid t USING (doc_id) GROUP BY 1, 2, 3)
      SELECT planted_lang, count(*)::BIGINT, CAST(sum(w) AS BIGINT),
             CAST(sum(n) AS BIGINT) FROM nt GROUP BY 1""").fetchall()}
    assert got_fert == ref_fert, f"fertility mismatch: {got_fert} vs {ref_fert}"
    print("fertility OK:", {k: f"{1000 * n // w} milli" for k, (d, w, n) in sorted(ref_fert.items())})

    # roundtrip: python decode of the reference ids == norm minus spaces
    u2b = {c: b for b, c in B2U.items()}
    inv = {v: k for k, v in vocab.items()}
    for i, (_, t) in corpus.items():
        chars = "".join(inv[x] if x >= 0x110000 else chr(x) for x in ref_enc[i])
        decoded = bytes(u2b[c] for c in chars).decode("utf-8")
        assert decoded == norm(t).replace(" ", ""), f"roundtrip fail doc {i}"
    print("roundtrip OK (multibyte reassembly across token boundaries)")
    print("ALL OK")


if __name__ == "__main__":
    main()
