from sclera_spark.operators.match.regex_nfa import compile_pattern, find_matches


def spans(pattern, seq):
    nfa = compile_pattern(pattern)
    return find_matches(nfa, [frozenset([s]) if isinstance(s, str) else frozenset(s) for s in seq])


def test_parse_surface():
    # parity with reference RegexParseSuite.scala:29-36
    for r in [
        "A*", "A+", "A?", "A+*", "A+?", "X*Y",
        "A|B", "(A.B)", "A.(B|C)", "A|(B.C)",
        "A B", "(A)(B)", "^(A|B)$", "hello world",
    ]:
        compile_pattern(r)


def test_simple_plus():
    assert spans("A+", list("BAABA")) == [(1, 3), (4, 5)]


def test_concat():
    assert spans("A B", list("ABAB")) == [(0, 2), (2, 4)]
    assert spans("A.B", list("AAB")) == [(1, 3)]


def test_alternation():
    assert spans("A|B", list("CABC")) == [(1, 2), (2, 3)]


def test_greedy_longest():
    # A+B? should take AAB, not AA
    assert spans("A+B?", list("AABC")) == [(0, 3)]


def test_optional_empty_skipped():
    # A* alone: zero-length matches skipped; greedy over A runs
    assert spans("A*", list("BAAB")) == [(1, 3)]


def test_anchors():
    assert spans("^A+", list("AAB")) == [(0, 2)]
    assert spans("^A+", list("BAA")) == []
    assert spans("A+$", list("AABAA")) == [(3, 5)]
    assert spans("^A+$", list("AAA")) == [(0, 3)]
    assert spans("^A+$", list("AAB")) == []


def test_session_pattern():
    # LOGIN BROWSE* BUY over an event stream
    seq = ["LOGIN", "BROWSE", "BROWSE", "BUY", "LOGIN", "BUY", "LOGOUT"]
    assert spans("LOGIN BROWSE* BUY", seq) == [(0, 4), (4, 6)]


def test_multi_label_rows():
    # rows can carry several labels (PredRowLabeler)
    seq = [{"A", "X"}, {"B"}, {"X"}]
    assert spans("A B", seq) == [(0, 2)]
    assert spans("X+", seq) == [(0, 1), (2, 3)]


def test_nested_quantifiers():
    assert spans("(A B)+", list("ABABAB")) == [(0, 6)]
    assert spans("(A|B)+C", list("ABBAC")) == [(0, 5)]
