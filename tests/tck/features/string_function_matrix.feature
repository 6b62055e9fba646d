Feature: String function matrix — split, replace, substring, trim family

  Scenario: split on a simple separator
    Given an empty graph
    When executing query:
      """
      RETURN split('a,b,c', ',') AS v
      """
    Then the result should be, in any order:
      | v               |
      | ['a', 'b', 'c'] |

  Scenario: split keeps empty segments
    Given an empty graph
    When executing query:
      """
      RETURN split('a,,b', ',') AS v
      """
    Then the result should be, in any order:
      | v              |
      | ['a', '', 'b'] |

  Scenario: split with no separator occurrence returns whole string
    Given an empty graph
    When executing query:
      """
      RETURN split('abc', ',') AS v
      """
    Then the result should be, in any order:
      | v       |
      | ['abc'] |

  Scenario: split of null or by null is null
    Given an empty graph
    When executing query:
      """
      RETURN split(null, ',') AS a, split('a', null) AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: replace all occurrences
    Given an empty graph
    When executing query:
      """
      RETURN replace('aaa', 'a', 'b') AS a, replace('abcabc', 'bc', 'x') AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | 'bbb' | 'axax' |

  Scenario: replace with empty search returns the original
    Given an empty graph
    When executing query:
      """
      RETURN replace('abc', '', 'x') AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'abc' |

  Scenario: replace propagates null in any argument
    Given an empty graph
    When executing query:
      """
      RETURN replace(null, 'a', 'b') AS a, replace('s', null, 'b') AS b,
             replace('s', 'a', null) AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |

  Scenario: substring from an index to the end
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 1) AS a, substring('hello', 0) AS b
      """
    Then the result should be, in any order:
      | a      | b       |
      | 'ello' | 'hello' |

  Scenario: substring with length clamps at the end
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 1, 2) AS a, substring('hello', 3, 99) AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | 'el' | 'lo' |

  Scenario: substring past the end is empty
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 99) AS v
      """
    Then the result should be, in any order:
      | v  |
      | '' |

  Scenario: left and right clamp to the string length
    Given an empty graph
    When executing query:
      """
      RETURN left('hello', 2) AS a, right('hello', 2) AS b, left('hi', 99) AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | 'he' | 'lo' | 'hi' |

  Scenario: trim family strips only the intended side
    Given an empty graph
    When executing query:
      """
      RETURN trim('  x  ') AS a, ltrim('  x  ') AS b, rtrim('  x  ') AS c
      """
    Then the result should be, in any order:
      | a   | b      | c      |
      | 'x' | 'x  '  | '  x'  |

  Scenario: toUpper toLower round trip
    Given an empty graph
    When executing query:
      """
      RETURN toUpper('MiXeD') AS a, toLower('MiXeD') AS b
      """
    Then the result should be, in any order:
      | a       | b       |
      | 'MIXED' | 'mixed' |

  Scenario: reverse of a string
    Given an empty graph
    When executing query:
      """
      RETURN reverse('abc') AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'cba' |

  Scenario: size of a string counts characters
    Given an empty graph
    When executing query:
      """
      RETURN size('hello') AS a, size('') AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 5 | 0 |

  Scenario: string concatenation with plus coerces numbers
    Given an empty graph
    When executing query:
      """
      RETURN 'a' + 'b' AS a, 'n=' + 5 AS b, 1 + 'x' AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | 'ab' | 'n=5' | '1x' |

  Scenario: STARTS WITH ENDS WITH CONTAINS truth table
    Given an empty graph
    When executing query:
      """
      WITH 'hello' AS s
      RETURN s STARTS WITH 'he' AS a, s ENDS WITH 'lo' AS b,
             s CONTAINS 'ell' AS c, s CONTAINS 'xyz' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d     |
      | true | true | true | false |

  Scenario: predicate operators propagate null operands
    Given an empty graph
    When executing query:
      """
      WITH 'hello' AS s
      RETURN s STARTS WITH null AS a, null ENDS WITH 'x' AS b,
             s CONTAINS null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |

  Scenario: empty-string edge cases for predicates
    Given an empty graph
    When executing query:
      """
      WITH 'abc' AS s
      RETURN s STARTS WITH '' AS a, s ENDS WITH '' AS b, s CONTAINS '' AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |

  Scenario: regex full-match semantics
    Given an empty graph
    When executing query:
      """
      WITH 'hello' AS s
      RETURN s =~ 'hel.*' AS a, s =~ 'ell' AS b, s =~ '.*ell.*' AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |

  Scenario: regex with character classes and anchors behave full-match
    Given an empty graph
    When executing query:
      """
      RETURN 'a1b2' =~ '[a-z\\d]+' AS a, 'A1' =~ '(?i)a1' AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: split chained with size and list ops
    Given an empty graph
    When executing query:
      """
      WITH split('a b c d', ' ') AS words
      RETURN size(words) AS n, head(words) AS h, last(words) AS l
      """
    Then the result should be, in any order:
      | n | h   | l   |
      | 4 | 'a' | 'd' |

  Scenario: substring of empty string
    Given an empty graph
    When executing query:
      """
      RETURN substring('', 0) AS a, left('', 3) AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | '' | '' |
