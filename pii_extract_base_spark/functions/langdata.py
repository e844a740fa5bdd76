"""Embedded deterministic language seed data for the langid / perplexity
models (north-star stages N1/N2).

No external model files (fastText / KenLM are absent in this
environment, SURVEY.md preamble): both models are built at import time
from the word lists below, which also seed the non-English text of the
synthetic pages corpus — the classifier and the corpus share a
vocabulary by construction, which is exactly the determinism the
BASELINE.md parity targets need.
"""

SEED_WORDS = {
    "en": [
        "the", "of", "and", "to", "in", "is", "was", "for", "that", "with",
        "on", "as", "are", "this", "it", "from", "at", "by", "an", "be",
        "have", "not", "they", "which", "one", "you", "were", "her", "all",
        "she", "there", "would", "their", "will", "when", "who", "more",
        "about", "time", "people", "year", "work", "world", "because",
        "between", "number", "system", "data", "table", "value", "query",
        "page", "content", "information", "service", "report", "market",
    ],
    "es": [
        "el", "la", "de", "que", "y", "en", "un", "una", "ser", "los",
        "se", "no", "haber", "por", "con", "su", "para", "como", "estar",
        "tener", "les", "las", "del", "al", "más", "pero", "sus", "este",
        "entre", "cuando", "muy", "sobre", "también", "hasta", "donde",
        "quien", "desde", "todo", "nos", "durante", "todos", "uno",
        "años", "tiempo", "gente", "trabajo", "mundo", "porque", "número",
        "sistema", "datos", "tabla", "valor", "consulta", "página",
        "contenido", "información", "servicio", "informe", "mercado",
    ],
    "fr": [
        "le", "la", "de", "et", "les", "des", "en", "un", "du", "une",
        "que", "est", "dans", "qui", "par", "pour", "sur", "pas", "plus",
        "ne", "se", "au", "avec", "son", "ce", "il", "sont", "mais",
        "comme", "ou", "si", "leur", "tout", "nous", "sans", "autre",
        "après", "être", "aussi", "celui", "entre", "temps", "gens",
        "travail", "monde", "parce", "nombre", "système", "données",
        "tableau", "valeur", "requête", "page", "contenu", "information",
        "service", "rapport", "marché",
    ],
    "de": [
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit",
        "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
        "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat",
        "dass", "sie", "nach", "wird", "bei", "einer", "um", "am",
        "sind", "noch", "wie", "einem", "über", "einen", "so", "zum",
        "zeit", "leute", "arbeit", "welt", "weil", "nummer", "system",
        "daten", "tabelle", "wert", "abfrage", "seite", "inhalt",
        "information", "dienst", "bericht", "markt",
    ],
}

LANGS = sorted(SEED_WORDS)

# per-language stopword subsets for the C4/Gopher stopword rule (N3)
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "en", "los", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "que", "pour"],
    "de": ["der", "die", "und", "in", "den", "von", "das", "mit"],
}
