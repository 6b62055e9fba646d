Feature: String function edge cases and boundary behavior

  Scenario: substring is zero-based with and without length
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 1, 3) AS mid, substring('hello', 2) AS tailpart
      """
    Then the result should be, in any order:
      | mid   | tailpart |
      | 'ell' | 'llo'    |

  Scenario: substring length running past the end is clamped
    Given an empty graph
    When executing query:
      """
      RETURN substring('abc', 1, 99) AS s, substring('abc', 0, 0) AS z
      """
    Then the result should be, in any order:
      | s    | z  |
      | 'bc' | '' |

  Scenario: left and right longer than the string return the whole string
    Given an empty graph
    When executing query:
      """
      RETURN left('ab', 5) AS l, right('ab', 5) AS r
      """
    Then the result should be, in any order:
      | l    | r    |
      | 'ab' | 'ab' |

  Scenario: replace all occurrences including overlapping starts
    Given an empty graph
    When executing query:
      """
      RETURN replace('hello', 'l', 'w') AS a, replace('aaa', 'aa', 'b') AS b
      """
    Then the result should be, in any order:
      | a       | b    |
      | 'hewwo' | 'ba' |

  Scenario: replace with empty search string is identity
    Given an empty graph
    When executing query:
      """
      RETURN replace('abc', '', 'x') AS s
      """
    Then the result should be, in any order:
      | s     |
      | 'abc' |

  Scenario: split on a delimiter that never occurs
    Given an empty graph
    When executing query:
      """
      RETURN split('abc', ',') AS s
      """
    Then the result should be, in any order:
      | s       |
      | ['abc'] |

  Scenario: split keeps empty segments between adjacent delimiters
    Given an empty graph
    When executing query:
      """
      RETURN split('a,,b', ',') AS s
      """
    Then the result should be, in any order:
      | s              |
      | ['a', '', 'b'] |

  Scenario: trim family strips only the matching side
    Given an empty graph
    When executing query:
      """
      RETURN trim('  x  ') AS t, lTrim('  x  ') AS l, rTrim('  x  ') AS r
      """
    Then the result should be, in any order:
      | t   | l      | r      |
      | 'x' | 'x  '  | '  x'  |

  Scenario: size of a string counts characters
    Given an empty graph
    When executing query:
      """
      RETURN size('') AS e, size('abc') AS s
      """
    Then the result should be, in any order:
      | e | s |
      | 0 | 3 |

  Scenario: reverse of a string and of the empty string
    Given an empty graph
    When executing query:
      """
      RETURN reverse('abc') AS r, reverse('') AS e
      """
    Then the result should be, in any order:
      | r     | e  |
      | 'cba' | '' |

  Scenario: CONTAINS and STARTS WITH are case-sensitive
    Given an empty graph
    When executing query:
      """
      RETURN 'Hello' CONTAINS 'hell' AS c1, 'Hello' CONTAINS 'Hell' AS c2,
             'Hello' STARTS WITH 'he' AS s1, 'Hello' STARTS WITH 'He' AS s2
      """
    Then the result should be, in any order:
      | c1    | c2   | s1    | s2   |
      | false | true | false | true |

  Scenario: STARTS WITH and ENDS WITH on the empty string are true
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' STARTS WITH '' AS s, 'abc' ENDS WITH '' AS e,
             'abc' CONTAINS '' AS c
      """
    Then the result should be, in any order:
      | s    | e    | c    |
      | true | true | true |

  Scenario: Regex is anchored to the full string
    Given an empty graph
    When executing query:
      """
      RETURN 'abcd' =~ 'bc' AS partial, 'abcd' =~ '.*bc.*' AS wrapped
      """
    Then the result should be, in any order:
      | partial | wrapped |
      | false   | true    |

  Scenario: Regex with character class and quantifier
    Given an empty graph
    When executing query:
      """
      RETURN 'a1b2' =~ '[a-z0-9]+' AS ok, 'a1b2' =~ '[a-z]+' AS letters_only
      """
    Then the result should be, in any order:
      | ok   | letters_only |
      | true | false        |

  Scenario: toString round trips through toInteger
    Given an empty graph
    When executing query:
      """
      RETURN toInteger(toString(42)) AS i, toString(toInteger('7')) AS s
      """
    Then the result should be, in any order:
      | i  | s   |
      | 42 | '7' |

  Scenario: String concatenation with plus coerces numbers
    Given an empty graph
    When executing query:
      """
      RETURN 'n=' + 3 AS a, 1 + '2' AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | 'n=3' | '12' |

  Scenario: join concatenates with the separator and handles singletons
    Given an empty graph
    When executing query:
      """
      RETURN join(['a', 'b', 'c'], '-') AS j, join(['x'], '-') AS s,
             join([], '-') AS e
      """
    Then the result should be, in any order:
      | j       | s   | e  |
      | 'a-b-c' | 'x' | '' |

  Scenario: toUpper and toLower leave non-letters alone
    Given an empty graph
    When executing query:
      """
      RETURN toUpper('a1-b') AS u, toLower('A1-B') AS l
      """
    Then the result should be, in any order:
      | u      | l      |
      | 'A1-B' | 'a1-b' |
