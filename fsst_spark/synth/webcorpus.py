"""Deterministic synthetic Common-Crawl-style web corpus (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every value is a pure function of (seed, row_id) via a splitmix64-style
hash chain, so generation is reproducible regardless of partitioning or
batching, and the corpus regenerates identically at any cluster size.
Skew axes: hosts and languages are Zipfian (a few hosts/languages dominate
bytes), ~5% of texts are empty, text lengths are log-normal-ish with a
heavy tail, and ~1% of html payloads carry NUL/0xFF bytes (binary safety,
cf. reference tests/correctness.rs:50-55).

Note: this is *fixture generation*, not engine code — the engine's no-
per-row-Python rule applies to the codec kernels, not here. Word ids are
hashed vectorized; string assembly uses ``bytes.join`` (C memcpy), which
is O(rows) Python and allocates no large numpy temporaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)

N_HOSTS = 1000
HOST_ZIPF_S = 1.2
N_LANGS = 40
LANG_ZIPF_S = 1.4
TS_BASE_US = 1_717_200_000_000_000  # 2024-06-01T00:00:00Z in micros
TS_WINDOW_US = 30 * 86400 * 1_000_000

_LANGS = [
    "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "sv", "cs", "el", "hu", "da", "fi",
    "no", "uk", "ro", "id", "vi", "th", "he", "bg", "sk", "hr",
    "lt", "sl", "et", "lv", "sr", "fa", "hi", "bn", "ms", "ca",
]
_CJK_LANGS = {"zh", "ja", "ko"}


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + _SM_GAMMA) & M64
    x = ((x ^ (x >> np.uint64(30))) * _SM_M1) & M64
    x = ((x ^ (x >> np.uint64(27))) * _SM_M2) & M64
    return x ^ (x >> np.uint64(31))


def _h(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Per-(row, stream) uint64 hash."""
    mix = (stream * 0xD6E8FEB86659FD93 + seed) & 0xFFFFFFFFFFFFFFFF
    return _splitmix(ids.astype(np.uint64) * np.uint64(0x100000001B3) + np.uint64(mix))


def _uniform(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _h(ids, stream, seed).astype(np.float64) / 2.0**64


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return np.cumsum(w) / w.sum()


_HOST_CDF = _zipf_cdf(N_HOSTS, HOST_ZIPF_S)
_LANG_CDF = _zipf_cdf(N_LANGS, LANG_ZIPF_S)


def _latin_vocab(seed: int = 42, n: int = 4096) -> list[bytes]:
    rng = np.random.default_rng(seed)
    syll = [b"ta", b"re", b"no", b"li", b"sa", b"mo", b"vi", b"ke", b"du", b"pa",
            b"the", b"ing", b"er", b"an", b"on", b"en", b"at", b"or", b"es", b"tion"]
    out = []
    for _ in range(n):
        k = rng.integers(1, 5)
        out.append(b"".join(syll[i] for i in rng.integers(0, len(syll), k)))
    return out


def _cjk_vocab(seed: int = 43, n: int = 1024) -> list[bytes]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = rng.integers(1, 4)
        out.append("".join(chr(0x4E00 + int(c)) for c in rng.integers(0, 2000, k)).encode())
    return out


_LAT = _latin_vocab()
_CJK = _cjk_vocab()
_HOST_PREFIX = [f"https://www.host{h:04d}.example-{h % 7}.org/".encode() for h in range(N_HOSTS)]
_PAGES = [f"/p{x}.html".encode() for x in range(100)]
_HTML_PRE = (b"<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>page</title>"
             b"<link rel=\"stylesheet\" href=\"/static/site.css\"></head><body><main><article><p>")
_HTML_POST = b"</p></article></main><footer>&copy; 2024 example org</footer></body></html>"


def _norminv(u: np.ndarray) -> np.ndarray:
    """Cheap inverse-normal approximation (scaled logistic) for length dist."""
    u = u.clip(1e-9, 1 - 1e-9)
    return 0.5513 * np.log(u / (1 - u))


def generate_batch(ids: np.ndarray, seed: int = 42) -> pa.RecordBatch:
    """Generate web-page rows for the given row ids (any order/partition)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)

    host_id = np.searchsorted(_HOST_CDF, _uniform(ids, 1, seed))
    lang_id = np.searchsorted(_LANG_CDF, _uniform(ids, 2, seed))
    is_cjk = np.isin(lang_id, [i for i, l in enumerate(_LANGS) if l in _CJK_LANGS])
    langs = [_LANGS[i] for i in lang_id.tolist()]

    # --- text: word-salad, log-normal-ish length, ~5% empty ----------------
    u_len = _uniform(ids, 3, seed)
    n_words = np.where(
        u_len < 0.05, 0,
        np.exp(np.log(300) + 1.0 * _norminv(_uniform(ids, 4, seed))).astype(np.int64).clip(1, 12000),
    ).astype(np.int64)
    wcum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_words, out=wcum[1:])
    row_of_word = np.repeat(np.arange(n, dtype=np.int64), n_words)
    word_pos = np.arange(int(wcum[-1]), dtype=np.int64) - wcum[row_of_word]
    wh = _h(ids[row_of_word] * np.int64(2654435761) + word_pos, 5, seed)
    wid_lat = (wh % np.uint64(len(_LAT))).astype(np.int64).tolist()
    wid_cjk = (wh % np.uint64(len(_CJK))).astype(np.int64).tolist()

    texts: list[bytes] = []
    space = b" "
    lat, cjk = _LAT, _CJK
    cjk_flags = is_cjk.tolist()
    bounds = wcum.tolist()
    for i in range(n):
        a, b = bounds[i], bounds[i + 1]
        if a == b:
            texts.append(b"")
        elif cjk_flags[i]:
            texts.append(space.join(map(cjk.__getitem__, wid_cjk[a:b])))
        else:
            texts.append(space.join(map(lat.__getitem__, wid_lat[a:b])))

    # --- url -----------------------------------------------------------------
    nseg = (1 + (_h(ids, 6, seed) % np.uint64(3))).astype(np.int64)
    seg_h0 = _h(ids, 7, seed) % np.uint64(len(_LAT))
    seg_h1 = _h(ids, 11, seed) % np.uint64(len(_LAT))
    seg_h2 = _h(ids, 12, seed) % np.uint64(len(_LAT))
    page_id = (_h(ids, 8, seed) % np.uint64(100)).astype(np.int64).tolist()
    slash = b"/"
    urls = []
    seg_cols = (seg_h0.astype(np.int64).tolist(), seg_h1.astype(np.int64).tolist(),
                seg_h2.astype(np.int64).tolist())
    nseg_l = nseg.tolist()
    host_l = host_id.tolist()
    for i in range(n):
        segs = slash.join(lat[seg_cols[k][i]] for k in range(nseg_l[i]))
        urls.append(_HOST_PREFIX[host_l[i]] + segs + _PAGES[page_id[i]])

    # --- warc_ts: clustered per host with jitter, second precision ----------
    host_base = (TS_BASE_US + host_id.astype(np.int64) * (TS_WINDOW_US // N_HOSTS)).astype(np.int64)
    jitter = (_h(ids, 9, seed) % np.uint64(TS_WINDOW_US // N_HOSTS)).astype(np.int64)
    warc_ts = ((host_base + jitter) // 1_000_000 * 1_000_000).astype(np.int64)

    # --- html: boilerplate wrapping the text ---------------------------------
    weird = (_uniform(ids, 10, seed) < 0.01).tolist()
    pre, post = _HTML_PRE, _HTML_POST
    weird_marker = b"\x00\xff"
    htmls = [
        (pre + weird_marker + t + post) if w else (pre + t + post)
        for t, w in zip(texts, weird)
    ]

    return pa.RecordBatch.from_arrays(
        [
            pa.array([u.decode() for u in urls], type=pa.string()),
            pa.array(warc_ts, type=pa.int64()).cast(pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array([t.decode() for t in texts], type=pa.string()),
            pa.array(langs, type=pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


WEB_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def synth_web_df(spark, n_rows: int, seed: int = 42, parallelism: int | None = None):
    """Distributed deterministic corpus as a Spark DataFrame."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            # bound per-RecordBatch size for arrow transfer
            for lo in range(0, len(ids), 20000):
                yield generate_batch(ids[lo : lo + 20000], seed=seed)

    return spark.range(0, n_rows, numPartitions=parallelism).mapInArrow(gen, WEB_SCHEMA_DDL)
