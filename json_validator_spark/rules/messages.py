"""Localized violation-message catalogs.

The reference ships per-locale message bundles
(``validator_en.properties``, ``jsv-messages.properties`` variants) and
resolves the active locale per request/domain. Here the catalog is
locale-keyed static data resolved ONCE at rule-compile time — messages
are plan constants, so localization costs nothing at execution.

Messages stay value-free (no interpolated actual values, unlike the
reference's ``{0}``/``{1}`` slots): the aggregate rollup groups on
``severity|message`` identity (``JSONValidator.java:466-481,479``), and
value-free messages keep that grouping exact and deterministic. The
``rule_id``-keyed contract means locale changes never affect
correctness — only the human-facing ``message`` column.
"""

from __future__ import annotations

# 'en' texts are the canonical contract — oracle SQL fixtures quote them
# verbatim; do not edit without updating __spark_entry__.py.
CATALOGS: dict[str, dict[str, str]] = {
    "en": {
        "required": "required value is missing",
        "forbidden": "value must not be present",
        "dependentRequired": "dependent required value is missing",
        "const": "value does not equal the required constant",
        "enum": "value is not in the allowed set",
        "pattern": "value does not match the required pattern",
        "format": "value does not conform to the required format",
        "type": "value is not of the expected type",
        "monotonic": "array field is not strictly increasing",
        "uniqueItems": "array elements are not unique",
        "contains": "array does not contain the required number of matching elements",
        "refDepthExceeded": "value nests deeper than the unrolled $ref depth",
        "__default__": "constraint '{kind}' violated",
    },
    "fr": {
        "required": "la valeur obligatoire est absente",
        "forbidden": "la valeur ne doit pas être présente",
        "dependentRequired": "la valeur obligatoire dépendante est absente",
        "const": "la valeur ne correspond pas à la constante attendue",
        "enum": "la valeur ne figure pas dans l'ensemble autorisé",
        "pattern": "la valeur ne correspond pas au motif requis",
        "format": "la valeur ne respecte pas le format requis",
        "type": "la valeur n'est pas du type attendu",
        "monotonic": "le champ du tableau n'est pas strictement croissant",
        "uniqueItems": "les éléments du tableau ne sont pas uniques",
        "contains": "le tableau ne contient pas le nombre requis d'éléments correspondants",
        "refDepthExceeded": "la valeur est imbriquée au-delà de la profondeur $ref déroulée",
        "__default__": "contrainte '{kind}' non respectée",
    },
    "de": {
        "required": "Pflichtwert fehlt",
        "forbidden": "Wert darf nicht vorhanden sein",
        "dependentRequired": "abhängiger Pflichtwert fehlt",
        "const": "Wert entspricht nicht der geforderten Konstante",
        "enum": "Wert liegt nicht in der erlaubten Menge",
        "pattern": "Wert entspricht nicht dem geforderten Muster",
        "format": "Wert entspricht nicht dem geforderten Format",
        "type": "Wert hat nicht den erwarteten Typ",
        "monotonic": "Array-Feld ist nicht streng aufsteigend",
        "uniqueItems": "Array-Elemente sind nicht eindeutig",
        "contains": "Array enthält nicht die geforderte Anzahl passender Elemente",
        "refDepthExceeded": "Wert ist tiefer verschachtelt als die entrollte $ref-Tiefe",
        "__default__": "Bedingung '{kind}' verletzt",
    },
}

_active_locale = "en"


def set_locale(locale: str) -> None:
    """Select the catalog used by subsequent rule compilation (the
    per-domain locale of the reference's bundle resolution). Unknown
    locales raise — a config error, surfaced like an unknown rule kind."""
    global _active_locale
    if locale not in CATALOGS:
        raise ValueError(f"no message catalog for locale {locale!r}: {sorted(CATALOGS)}")
    _active_locale = locale


def get_locale() -> str:
    return _active_locale


def message_for(kind: str, locale: str | None = None) -> str:
    cat = CATALOGS[locale or _active_locale]
    return cat.get(kind, cat["__default__"].format(kind=kind))
