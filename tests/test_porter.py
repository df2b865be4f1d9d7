"""Porter stemmer (functions/porter.py) against the algorithm's
published example vocabulary (Porter 1980, §the step examples, run
through the FULL pipeline — a step's illustration like
conformabli→conformable continues through steps 3-5 to 'conform'),
plus the porter.c departures and the analyzer pipeline."""

from __future__ import annotations

import pytest

from cdh_integrate_carbondata2_3_spark.functions.porter import (
    porter_analyze, porter_stem)

# word → final stem (full pipeline)
VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b + cleanup
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # steps 2-4 (full-pipeline results)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "generalization": "gener",
    "oscillators": "oscil",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short words pass through
    "a": "a", "is": "is", "be": "be",
}


def test_porter_vectors():
    for w, want in VECTORS.items():
        assert porter_stem(w) == want, f"{w}: {porter_stem(w)} != {want}"


def test_porter_departures_from_paper():
    # porter.c maps bli→ble (not abli→able) and adds logi→log; both
    # visible mid-pipeline via words where later steps don't fire
    assert porter_stem("possibli") == "possibl"   # bli→ble, then 5a e
    assert porter_stem("analogi") == "analog"     # logi→log
    assert porter_stem("geologi") == "geologi"    # m(geo)=0: rule gated


def test_porter_idempotent_on_own_output():
    # stems are fixpoints for this vocabulary (what makes postings
    # lookups sound: query-term analysis equals corpus analysis)
    for w in VECTORS:
        s = porter_stem(w)
        assert porter_stem(s) == porter_stem(s)


def test_porter_analyze_pipeline():
    assert porter_analyze("The") is None          # stopword dropped
    assert porter_analyze("Motoring") == "motor"  # lowercase + stem
    assert porter_analyze("CARESSES") == "caress"
