Feature: String predicate and regex corners (STARTS/ENDS/CONTAINS/=~ 3VL,
  regex anchoring and classes)

  Scenario: Regex is a full match not a search
    Given an empty graph
    When executing query:
      """
      RETURN 'abcd' =~ 'bc' AS part, 'abcd' =~ '.*bc.*' AS full
      """
    Then the result should be, in any order:
      | part  | full |
      | false | true |

  Scenario: Regex character classes and quantifiers
    Given an empty graph
    When executing query:
      """
      RETURN 'a1b2' =~ '[a-z]\\d[a-z]\\d' AS m, 'aaa' =~ 'a{3}' AS q
      """
    Then the result should be, in any order:
      | m    | q    |
      | true | true |

  Scenario: Regex alternation and case-insensitive flag
    Given an empty graph
    When executing query:
      """
      RETURN 'cat' =~ 'cat|dog' AS alt, 'CAT' =~ '(?i)cat' AS ci
      """
    Then the result should be, in any order:
      | alt  | ci   |
      | true | true |

  Scenario: String predicates with null operands are null
    Given an empty graph
    When executing query:
      """
      RETURN null STARTS WITH 'a' AS a, 'abc' ENDS WITH null AS b,
             null CONTAINS null AS c, null =~ 'x' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: Empty-string edge cases
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' STARTS WITH '' AS sw, 'abc' CONTAINS '' AS ct,
             '' STARTS WITH '' AS ee, '' CONTAINS 'a' AS ec
      """
    Then the result should be, in any order:
      | sw   | ct   | ee   | ec    |
      | true | true | true | false |

  Scenario: CONTAINS is case sensitive
    Given an empty graph
    When executing query:
      """
      RETURN 'Hello' CONTAINS 'hello' AS a, 'Hello' CONTAINS 'Hel' AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | false | true |

  Scenario: STARTS WITH on property values
    Given an empty graph
    And having executed:
      """
      CREATE (:P {s: 'apple'}), (:P {s: 'apricot'}), (:P {s: 'banana'})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.s STARTS WITH 'ap' RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Regex with escaped dot
    Given an empty graph
    When executing query:
      """
      RETURN 'a.b' =~ 'a\\.b' AS esc, 'axb' =~ 'a\\.b' AS lit
      """
    Then the result should be, in any order:
      | esc  | lit   |
      | true | false |

  Scenario: Concatenation with + in predicates
    Given an empty graph
    When executing query:
      """
      RETURN ('ab' + 'cd') STARTS WITH 'abc' AS x
      """
    Then the result should be, in any order:
      | x    |
      | true |

  Scenario: String functions inside predicates
    Given an empty graph
    And having executed:
      """
      CREATE (:P {s: '  Trimmed  '})
      """
    When executing query:
      """
      MATCH (p:P) WHERE toLower(trim(p.s)) = 'trimmed' RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: Unicode strings compare and size correctly
    Given an empty graph
    When executing query:
      """
      RETURN size('héllo') AS n, 'héllo' = 'héllo' AS eq
      """
    Then the result should be, in any order:
      | n | eq   |
      | 5 | true |

  Scenario: toString then regex round trip
    Given an empty graph
    When executing query:
      """
      RETURN toString(123) =~ '\\d+' AS m
      """
    Then the result should be, in any order:
      | m    |
      | true |
