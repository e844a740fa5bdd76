"""Text normalization (parity: reference helper/normalizer.py:6-21).

Provenance: behavior-matching transcription of a 10-line helper whose
exact semantics are the contract (piisa/pii-extract-base, Apache-2.0).
"""

from .defs import LANG_ANY


def normalize(text: str, lang: str = LANG_ANY,
              whitespace: bool = False, lowercase: bool = False) -> str:
    """Whitespace-collapse and/or lowercase a string.

    ``lang`` is accepted but unused, matching the reference signature
    (helper/normalizer.py:7 "CURRENTLY UNUSED").
    """
    if whitespace:
        text = " ".join(text.split())
    if lowercase:
        text = text.lower()
    return text
