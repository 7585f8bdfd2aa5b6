"""Public-suffix table for eTLD+1 (root-domain) extraction.

The reference ships a full TLD-name table (util/TLDNamesCollection.java,
consumed by URLUtils.extractRootDomainName at util/URLUtils.java:737).
This module carries the engine's equivalent: a curated, substantial
subset of the public-suffix list (the Mozilla PSL data is public), with
the PSL's matching rules -- longest explicit suffix wins, wildcard
TLDs make every direct child a suffix, exceptions punch holes in
wildcards. A production deployment can swap `PUBLIC_SUFFIXES` for a
parse of the full PSL file without touching the algorithm in
functions/urls.py.

Single-label TLDs need no entries: the PSL default rule ("*") already
treats the last label as the suffix.
"""

from __future__ import annotations


def _expand(fmt: str, names: str) -> list[str]:
    return [fmt.format(n) for n in names.split()]


_JP_PREFECTURES = (
    "aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma "
    "hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima "
    "kanagawa kochi kumamoto kyoto mie miyagi miyazaki nagano nagasaki "
    "nara niigata oita okayama okinawa osaka saga saitama shiga shimane "
    "shizuoka tochigi tokushima tokyo tottori toyama wakayama yamagata "
    "yamaguchi yamanashi"
)

_US_STATES = (
    "al ak az ar ca co ct de fl ga hi id il in ia ks ky la me md ma mi "
    "mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn tx ut "
    "vt va wa wv wi wy dc"
)

PUBLIC_SUFFIXES: frozenset[str] = frozenset(
    # United Kingdom
    _expand("{}.uk", "co org me ltd plc net sch ac gov nhs police mod")
    # Japan: organizational + prefectural
    + _expand("{}.jp", "co ne or ac ad ed go gr lg")
    + _expand("{}.jp", _JP_PREFECTURES)
    # Australia / New Zealand
    + _expand("{}.au", "com net org edu gov asn id act nsw nt qld sa tas vic wa")
    + _expand("{}.nz", "co net org govt ac school geek gen kiwi maori")
    # Americas
    + _expand("{}.br", "com net org gov edu mil art blog eco")
    + _expand("{}.mx", "com net org gob edu")
    + _expand("{}.ar", "com net org gob gov edu int mil")
    + _expand("{}.co", "com net org gov edu mil nom")
    + _expand("{}.pe", "com net org gob edu mil nom")
    + _expand("{}.ve", "com net org gob edu")
    + _expand("{}.uy", "com net org gub edu mil")
    + _expand("{}.ec", "com net org gob edu mil fin med pro info")
    + _expand("{}.ca", "ab bc mb nb nf nl ns nt nu on pe qc sk yk gc")
    + _expand("{}.us", _US_STATES)
    # Asia
    + _expand("{}.cn", "com net org gov edu ac mil")
    + _expand("{}.in", "co net org gov ac edu res gen firm ind nic")
    + _expand("{}.kr", "co ne or go ac re pe mil hs ms es sc kg")
    + _expand("{}.tw", "com net org gov edu idv")
    + _expand("{}.hk", "com net org gov edu idv")
    + _expand("{}.sg", "com net org gov edu per")
    + _expand("{}.my", "com net org gov edu mil name")
    + _expand("{}.th", "co in or go ac net mi")
    + _expand("{}.id", "co net or go ac web sch my biz")
    + _expand("{}.ph", "com net org gov edu ngo")
    + _expand("{}.vn", "com net org gov edu ac biz info pro")
    # Middle East / Africa
    + _expand("{}.il", "co net org gov ac muni idf k12")
    + _expand("{}.sa", "com net org gov edu med sch pub")
    + _expand("{}.ae", "co net org gov ac sch mil")
    + _expand("{}.eg", "com net org gov edu eun sci")
    + _expand("{}.tr", "com net org gov edu mil bel pol av dr k12 gen web")
    + _expand("{}.za", "co net org gov edu ac web")
    + _expand("{}.ng", "com net org gov edu sch name mobi")
    + _expand("{}.ke", "co ne or go ac sc me mobi info")
    + _expand("{}.gh", "com edu gov org mil")
    # Europe
    + _expand("{}.ru", "com net org pp msk spb")
    + _expand("{}.ua", "com net org gov edu in kiev od")
    + _expand("{}.pl", "com net org gov edu waw wroc krakow")
    + _expand("{}.at", "co or ac gv priv")
    + _expand("{}.gr", "com net org edu gov")
    + _expand("{}.ro", "com nom nt org rec store tm www firm info arts")
    + _expand("{}.pt", "com edu gov int net nome org publ")
    + _expand("{}.es", "com nom org gob edu")
    + _expand("{}.hu", "co org info priv sport tm news shop suli")
    + ["gov.ie"]
    # hosting / platform suffixes (the PSL private section)
    + [
        "github.io",
        "githubusercontent.com",
        "gitlab.io",
        "blogspot.com",
        "appspot.com",
        "herokuapp.com",
        "azurewebsites.net",
        "firebaseapp.com",
        "web.app",
        "pages.dev",
        "netlify.app",
        "vercel.app",
        "onrender.com",
        "fly.dev",
        "glitch.me",
        "repl.co",
        "wordpress.com",
        "ngrok.io",
        "pythonanywhere.com",
        "readthedocs.io",
        "surge.sh",
        "dyndns.org",
        "no-ip.org",
        "duckdns.org",
        "s3.amazonaws.com",
        "elasticbeanstalk.com",
    ]
)

#: TLDs whose every direct child is a public suffix ("*.ck" rules)
WILDCARD_TLDS: frozenset[str] = frozenset(
    {"ck", "jm", "kh", "mm", "pg", "bd", "fj", "np", "er"}
)

#: exception rules punching holes in the wildcards ("!www.ck")
WILDCARD_EXCEPTIONS: frozenset[str] = frozenset({"www.ck"})


def suffix_label_count(labels: list[str]) -> int:
    """Number of trailing labels forming the public suffix (PSL
    matching: longest explicit rule wins; wildcard TLD makes the last
    two labels a suffix unless an exception names that child)."""
    n = len(labels)
    sl = 1
    for k in (3, 2):
        if n >= k and ".".join(labels[-k:]) in PUBLIC_SUFFIXES:
            sl = k
            break
    if labels and labels[-1] in WILDCARD_TLDS:
        if n >= 2 and ".".join(labels[-2:]) in WILDCARD_EXCEPTIONS:
            sl = 1
        else:
            sl = max(sl, 2)
    return sl
