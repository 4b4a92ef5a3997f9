"""Greek-letter and dash inventories used by the normalizer.

Semantics per the reference's language-phenomena tables
(``kazu/language/language_phenomena.py:1-57``): a mapping of every
upper/lower greek codepoint to its spelled-out English name, and the set
of unicode dash codepoints treated as token separators.
"""

# upper-case greek letters → names, then lower-case (incl. variant forms).
_GREEK_UPPER = {
    "Α": "alpha", "Β": "beta", "Γ": "gamma", "Δ": "delta",
    "Ε": "epsilon", "Ζ": "zeta", "Η": "eta", "Θ": "theta",
    "Ι": "iota", "Κ": "kappa", "Λ": "lambda", "Μ": "mu",
    "Ν": "nu", "Ξ": "xi", "Ο": "omicron", "Π": "pi",
    "Ρ": "rho", "Σ": "sigma", "Τ": "tau", "Υ": "upsilon",
    "Φ": "phi", "Χ": "chi", "Ψ": "psi", "Ω": "omega",
    "ϴ": "theta",
}
_GREEK_LOWER = {
    "α": "alpha", "ϐ": "beta", "β": "beta", "γ": "gamma",
    "δ": "delta", "ε": "epsilon", "ζ": "zeta", "η": "eta",
    "θ": "theta", "ι": "iota", "κ": "kappa", "λ": "lambda",
    "μ": "mu", "ν": "nu", "ξ": "xi", "ο": "omicron",
    "π": "pi", "ρ": "rho", "ς": "final sigma", "σ": "sigma",
    "τ": "tau", "υ": "upsilon", "φ": "phi", "ϕ": "phi",
    "χ": "chi", "ψ": "psi", "ω": "omega",
}

GREEK_SUBS: dict[str, str] = {**_GREEK_UPPER, **_GREEK_LOWER}

DASHES: set[str] = {chr(0x2212), chr(0x002D)}
DASHES.update(chr(c) for c in range(0x2010, 0x2016))
