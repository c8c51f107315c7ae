"""covsonar variant-token grammar and query-rewrite layer — pure Python,
framework-free (runs driver-side before any Spark plan is built).

Re-expresses the reference's rewrite pipeline (studied at
/root/reference/lib/sonardb.py — regexes :2242-2286, IUPAC tables
:2288-2368, pinpoint_mutation :3034-3084, make_profile_explicit
:3086-3113, _fix_X_N_search :3115-3131, wildcard-OR quirk
:1623-1639) with original code.

Token grammar (reference README.md:136-143):
  nt SNP / insertion   ``C241T``, ``C40CTT``   (anchor base + inserted)
  nt deletion          ``del:start1:len``       (1-based start)
  aa variant           ``S:N501Y``, ``N:A34AK``
  aa deletion          ``S:del:68:3``
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

# SARS-CoV-2 CDS symbols from the reference annotation (lib/ref.gff3);
# engines built for other references pass their own symbol list.
DEFAULT_SYMBOLS = (
    "ORF1a", "ORF1b", "S", "ORF3a", "E", "M", "ORF6",
    "ORF7a", "ORF7b", "ORF8", "N", "ORF10",
)

# IUPAC nucleotide ambiguity codes (public standard; reference table at
# lib/sonardb.py:2288-2308).  N is the full wildcard.
IUPAC_NT: dict[str, frozenset[str]] = {
    "A": frozenset("A"), "C": frozenset("C"), "G": frozenset("G"), "T": frozenset("T"),
    "R": frozenset("AGR"), "Y": frozenset("CTY"), "S": frozenset("GCS"),
    "W": frozenset("ATW"), "K": frozenset("GTK"), "M": frozenset("ACM"),
    "B": frozenset("CGTB"), "D": frozenset("AGTD"), "H": frozenset("ACTH"),
    "V": frozenset("ACGV"),
}
IUPAC_NT["N"] = frozenset(IUPAC_NT) | frozenset("N")

# IUPAC / extended amino-acid codes incl. the non-standard groups the
# reference supports (lib/sonardb.py:2326-2368).  X is the full wildcard.
IUPAC_AA: dict[str, frozenset[str]] = {
    **{a: frozenset(a) for a in "ARNDCQEGHILKMFPSTWYVUO"},
    "B": frozenset("DNB"), "Z": frozenset("EQZ"), "J": frozenset("ILJ"),
    "Φ": frozenset("VILFWYMΦ"), "Ω": frozenset("FWYHΩ"), "Ψ": frozenset("VILMΨ"),
    "π": frozenset("PGASπ"), "ζ": frozenset("STHNQEDKRζ"),
    "+": frozenset("KRH+"), "-": frozenset("DE-"),
}
IUPAC_AA["X"] = frozenset(IUPAC_AA) | frozenset("X")

EXPLICIT_NT = frozenset(k for k, v in IUPAC_NT.items() if len(v) == 1)
AMBIG_NT = frozenset(k for k, v in IUPAC_NT.items() if len(v) > 1)
EXPLICIT_AA = frozenset(k for k, v in IUPAC_AA.items() if len(v) == 1)
AMBIG_AA = frozenset(k for k, v in IUPAC_AA.items() if len(v) > 1)

# final single capital letter of a token — the (only) position pinpointing
# and output-ambiguity filtering look at (lib/sonardb.py:2204)
_TERMINAL_LETTER = re.compile(r"[A-Z]$")


@dataclass(frozen=True)
class TokenGrammar:
    """Compiled token validators for a given CDS symbol set."""

    symbols: tuple[str, ...] = DEFAULT_SYMBOLS
    dna_var: re.Pattern = field(init=False)
    aa_var: re.Pattern = field(init=False)
    deletion: re.Pattern = field(init=False)

    def __post_init__(self):
        nt_letters = "[" + "".join(IUPAC_NT) + "]"
        sym = "(?:" + "|".join(re.escape(s) for s in self.symbols) + ")"
        aa_letters = "[" + "".join(IUPAC_AA).replace("-", "") + "*~-" + "]"
        object.__setattr__(self, "dna_var", re.compile(
            rf"^(?:(?:del:[0-9]+:[0-9]+)|(?:{nt_letters}[0-9]+{nt_letters}+))$"))
        object.__setattr__(self, "aa_var", re.compile(
            rf"^{sym}:(?:(?:del:[0-9]+:[0-9]+)|(?:{aa_letters}[0-9]+{aa_letters}+))$"))
        object.__setattr__(self, "deletion", re.compile(
            rf"^(?:{sym}:)?del:[0-9]+:[0-9]+$"))

    def is_dna(self, tok: str) -> bool:
        return bool(self.dna_var.match(tok))

    def is_aa(self, tok: str) -> bool:
        return bool(self.aa_var.match(tok))

    def is_del(self, tok: str) -> bool:
        return bool(self.deletion.match(tok))


DEFAULT_GRAMMAR = TokenGrammar()


def pinpoint_mutation(tok: str, code: dict[str, frozenset[str]]) -> set[str]:
    """Expand the terminal ambiguity letter of a token into all explicit
    variants it covers (plus the token itself).

    Only the final capital letter is expanded — insertions keep their
    leading alt letters verbatim, and deletions (no terminal letter)
    pass through unchanged.
    """
    m = _TERMINAL_LETTER.search(tok)
    if not m:
        return {tok}
    stem = tok[: m.start()]
    options = [code[ch] for ch in m.group(0)]
    return {tok} | {stem + "".join(combo) for combo in itertools.product(*options)}


def classify_group(tokens: list[str], grammar: TokenGrammar = DEFAULT_GRAMMAR) -> dict[str, list[list[str]]]:
    """Route each token of one query group to its dna/aa bucket and expand
    ambiguities — one group becomes ``{"dna": [[tok expansions], …],
    "aa": [...]}`` keeping one expansion set per user token.

    Deliberate divergence: the reference flattens the expansions and
    AND-joins them (lib/sonardb.py:1625-1639 + 3086-3113), which makes a
    non-wildcard ambiguous search like ``A5001W`` unsatisfiable (a stored
    profile holds one call per site, never W *and* A *and* T).  Its own
    ``_fix_X_N_search`` exists to patch this for X/N only.  We implement
    the documented intent of pinpoint_mutation ("profiles … that match to
    a given profile"): a token matches if the profile contains ANY of its
    expansions; distinct tokens still AND."""
    out: dict[str, list[list[str]]] = {"dna": [], "aa": []}
    for tok in sorted(set(tokens)):
        if grammar.is_dna(tok):
            out["dna"].append(sorted(pinpoint_mutation(tok, IUPAC_NT)))
        else:
            out["aa"].append(sorted(pinpoint_mutation(tok, IUPAC_AA)))
    return out


def inject_wildcard_groups(groups: list[list[str]],
                           grammar: TokenGrammar = DEFAULT_GRAMMAR) -> list[list[str]]:
    """X/N "any change" handling: a trailing-X aa token (or trailing-N dna
    token) additionally injects each of its pinpointed variants as its own
    OR-group; the group list is then deduplicated."""
    extra: list[list[str]] = []
    for group in groups:
        for tok in group:
            if tok and tok[-1].lower() == "x" and not grammar.is_dna(tok):
                extra.extend([v] for v in pinpoint_mutation(tok, IUPAC_AA))
            elif tok and tok[-1].lower() == "n" and grammar.is_dna(tok):
                extra.extend([v] for v in pinpoint_mutation(tok, IUPAC_NT))
    merged = groups + extra
    seen: dict[tuple[str, ...], None] = {}
    for g in merged:
        seen.setdefault(tuple(g), None)
    return [list(t) for t in seen]


def group_any_mode(tokens: list[str] | list[list[str]], kind: str) -> bool:
    """The reference's wildcard quirk (lib/sonardb.py:1626-1637): if any
    dna token of a group ends in ``N`` (or any aa token in ``X``), that
    field's conjunction flips to a disjunction for the WHOLE group.
    Accepts flat token lists or per-token expansion lists."""
    wildcard = "N" if kind == "dna" else "X"
    flat = (t for x in tokens for t in (x if isinstance(x, list) else [x]))
    return any(t.endswith(wildcard) for t in flat)


def validate_tokens(groups: list[list[str]], grammar: TokenGrammar = DEFAULT_GRAMMAR) -> list[str]:
    """Return the invalid tokens across all groups (empty = all valid)."""
    return [t for g in groups for t in g if not grammar.is_dna(t) and not grammar.is_aa(t)]


def rewrite_profiles(groups: list[list[str]],
                     grammar: TokenGrammar = DEFAULT_GRAMMAR) -> list[dict[str, list[list[str]]]]:
    """Full include/exclude profile rewrite: validate → inject X/N OR
    groups → classify + IUPAC-expand each group."""
    bad = validate_tokens(groups, grammar)
    if bad:
        raise ValueError(f"non-valid variant expression(s): {', '.join(bad)}")
    return [classify_group(g, grammar) for g in inject_wildcard_groups(groups, grammar)]
