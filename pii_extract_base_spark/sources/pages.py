"""Deterministic synthetic Common-Crawl-style pages corpus.

Shape per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Generation is a pure function of ``doc_id`` (seed 42 folded in), so the
corpus is identical regardless of Spark partitioning, scale factor
shard, or executor count — the property every parity check relies on.
Text seeds come from the driver's documents.parquet (FIXTURES.md §1) and
the embedded per-language vocabulary (functions/langdata.py).

Injected PII values reuse the reference's own fixture values so oracle
behavior is pinned by its tests (FIXTURES.md §1, reference
test/data/minidoc-example.yaml and test/unit/D_api/test_A_processor.py:460-462).
"""

import datetime
import hashlib
import random
from typing import Iterator, List, Tuple

from ..functions.langdata import SEED_WORDS

# deterministic PII payloads (reference fixture values)
CC_VALID = "4273 9666 4581 5642"
CC_INVALID = "9999 9666 4581 5643"
PHONE_CTX = "+34983453999"
PHONE_NOCTX = "+34983453000"
EMAIL = "user.name+tag@sub.example.org"
IBAN_VALID = "DE89 3704 0044 0532 0130 00"     # canonical, mod-97 valid
IBAN_INVALID = "DE89 3703 0044 0532 0130 00"   # one digit off → checksum fails
BTC_ADDR = "1AGNa15ZQXAZUgFiqJ2i7Z2DPU2J6hW62i"
IPV4 = "192.168.12.34"
TOXIC_WORD = "badword1"
TFN = "123 456 789"

N_CLASSES = 20
# classes whose pages are built to FAIL the keep decision
DROP_CLASSES = {10, 11, 12, 13, 14, 15, 16}

PHONE_CTX_SENTENCE = {
    "en": f"you can reach our office phone at {PHONE_CTX} during hours.",
    "es": f"puede llamar al teléfono {PHONE_CTX} en horario de oficina.",
    "fr": f"appelez notre téléphone {PHONE_CTX} pendant les heures.",
    "de": f"erreichen sie unser telefon {PHONE_CTX} zu bürozeiten.",
}

_EPOCH = datetime.datetime(2024, 1, 1)


def _lang_for(doc_id: int) -> str:
    m = doc_id % 10
    if m == 7:
        return "es"
    if m == 8:
        return "fr"
    if m == 9:
        return "de"
    return "en"


def _pick_words(rng: random.Random, pool: List[str], n: int) -> List[str]:
    # quadratic bias toward low ranks ⇒ Zipf-ish, matches the scoring LM
    return [pool[int(len(pool) * rng.random() ** 2)] for _ in range(n)]


def _sentences(rng: random.Random, pool: List[str], n_lines: int) -> List[str]:
    lines = []
    for _ in range(n_lines):
        words = _pick_words(rng, pool, rng.randint(8, 14))
        lines.append(" ".join(words) + ".")
    return lines


def build_page(doc_id: int, seed_text: str = "") -> Tuple[str, str, int]:
    """Return (text, claimed_lang, defect_class) for one page."""
    rng = random.Random(doc_id * 1000003 + 42)
    # class decoupled from language (lang cycles with doc_id % 10, class
    # with doc_id // 10) so every defect class occurs in every language
    cls = (doc_id // 10) % N_CLASSES
    lang = _lang_for(doc_id)
    claimed = lang

    pool = list(SEED_WORDS[lang])
    if lang == "en" and seed_text:
        # fold some seed-document vocabulary in (deterministic slice)
        extra = seed_text.split()[:40]
        pool = pool + extra

    n_lines = rng.randint(8, 16)
    lines = _sentences(rng, pool, n_lines)

    def inject(sentence: str) -> None:
        lines.insert(rng.randint(1, len(lines) - 1), sentence)

    if cls == 1:
        inject(f"my current credit card number is {CC_VALID} indeed.")
    elif cls == 2:
        inject(f"this is not a valid credit card number: {CC_INVALID} at all.")
    elif cls == 3:
        inject(PHONE_CTX_SENTENCE[lang])
    elif cls == 4:
        inject(f"what is this number without any hint {PHONE_NOCTX} here.")
    elif cls == 5:
        inject(f"contact us at {EMAIL} for more information today.")
    elif cls == 6:
        inject(f"wire the funds to {IBAN_VALID} please.")
        inject(f"but never to {IBAN_INVALID} because it is wrong.")
    elif cls == 7:
        inject(f"btc donations to {BTC_ADDR} from host {IPV4} welcome.")
    elif cls == 8:
        inject(f"this sentence contains {TOXIC_WORD} which must be scrubbed.")
    elif cls == 9 and lang == "en":
        inject(f"the australian tax file number {TFN} was printed there.")
    elif cls == 10:
        lines = ["too short."]
    elif cls == 11:
        soup = " ".join("#{}<>[]|^~" for _ in range(30))
        lines = [soup] * 6
    elif cls == 12:
        lines = ["- " + l for l in lines] + ["- bullet item"] * 30
    elif cls == 13:
        lines = [lines[0]] * 20
    elif cls == 14:
        lines.insert(1, "function f() { return {a: 1}; }")
    elif cls == 15:
        # wrong-language body: claimed en, text es
        claimed = "en"
        rng2 = random.Random(doc_id * 7 + 13)
        lines = _sentences(rng2, list(SEED_WORDS["es"]), n_lines)
    elif cls == 16:
        lines = [l + "..." for l in lines]
    elif cls == 17:
        inject(f"my credit card number is {CC_VALID} and my office phone "
               f"number is {PHONE_CTX} today.")
        inject(f"email me at {EMAIL} whenever you like.")

    # skew tail: ~0.1% of docs are ~50× median length (FIXTURES.md §1);
    # fresh sentences (not repeats) so only size, not quality, is skewed
    if doc_id % 997 == 0 and cls not in DROP_CLASSES:
        lines = lines + _sentences(rng, pool, n_lines * 50)

    return "\n".join(lines), claimed, cls


def page_record(doc_id: int, seed_text: str = "") -> dict:
    text, lang, cls = build_page(doc_id, seed_text)
    h = hashlib.sha1(str(doc_id).encode()).hexdigest()[:8]
    return {
        "url": f"https://site{doc_id % 97}.example/{h}",
        "warc_ts": _EPOCH + datetime.timedelta(seconds=doc_id * 137),
        "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
        "text": text,
        "lang": lang,
    }


# ---------------------------------------------------------------------------
# Spark + pandas front-ends

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def synth_pages_pandas(documents_pdf, multiplier: int = 1):
    """Pure-pandas synthesizer (oracle side / small tests).

    multiplier M > 1 spawns M pages per seed document (page ids
    doc_id*M+j) — deterministic corpus amplification for benchmarks.
    """
    import pandas as pd
    recs = [page_record(int(r.doc_id) * multiplier + j, r.text or "")
            for r in documents_pdf.itertuples()
            for j in range(multiplier)]
    return pd.DataFrame(recs)


def synth_pages(spark, sf_dir: str, repartition: int = None,
                multiplier: int = 1):
    """Spark synthesizer: documents.parquet → pages DataFrame.

    Runs as mapInPandas over (doc_id, text) only — column pruning pushes
    the 2-column projection into the parquet scan.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    if repartition:
        docs = docs.repartition(repartition, "doc_id")

    def gen(batches) -> Iterator:
        for pdf in batches:
            yield synth_pages_pandas(pdf, multiplier)

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)
