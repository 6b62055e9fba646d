Feature: String function deep matrix (bounds, null args, composition)

  Scenario: substring with start only runs to the end
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello world', 6) AS r
      """
    Then the result should be, in any order:
      | r       |
      | 'world' |

  Scenario: substring start at string length yields empty
    Given an empty graph
    When executing query:
      """
      RETURN substring('abc', 3) AS r
      """
    Then the result should be, in any order:
      | r  |
      | '' |

  Scenario: substring length longer than remainder clamps
    Given an empty graph
    When executing query:
      """
      RETURN substring('abcdef', 4, 100) AS r
      """
    Then the result should be, in any order:
      | r    |
      | 'ef' |

  Scenario: substring zero length is empty
    Given an empty graph
    When executing query:
      """
      RETURN substring('abc', 1, 0) AS r
      """
    Then the result should be, in any order:
      | r  |
      | '' |

  Scenario: substring of null is null
    Given an empty graph
    When executing query:
      """
      RETURN substring(null, 1) AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |

  Scenario: left and right basic
    Given an empty graph
    When executing query:
      """
      RETURN left('hello', 2) AS l, right('hello', 2) AS r
      """
    Then the result should be, in any order:
      | l    | r    |
      | 'he' | 'lo' |

  Scenario: left longer than the string returns the whole string
    Given an empty graph
    When executing query:
      """
      RETURN left('ab', 10) AS l, right('ab', 10) AS r
      """
    Then the result should be, in any order:
      | l    | r    |
      | 'ab' | 'ab' |

  Scenario: trim family strips only outer whitespace
    Given an empty graph
    When executing query:
      """
      RETURN trim('  a b  ') AS t, ltrim('  a b  ') AS l, rtrim('  a b  ') AS r
      """
    Then the result should be, in any order:
      | t     | l       | r       |
      | 'a b' | 'a b  ' | '  a b' |

  Scenario: replace all occurrences
    Given an empty graph
    When executing query:
      """
      RETURN replace('aXbXc', 'X', '-') AS r
      """
    Then the result should be, in any order:
      | r       |
      | 'a-b-c' |

  Scenario: replace with empty target string
    Given an empty graph
    When executing query:
      """
      RETURN replace('abc', 'b', '') AS r
      """
    Then the result should be, in any order:
      | r    |
      | 'ac' |

  Scenario: replace of a missing substring is identity
    Given an empty graph
    When executing query:
      """
      RETURN replace('abc', 'z', 'y') AS r
      """
    Then the result should be, in any order:
      | r     |
      | 'abc' |

  Scenario: replace with null arguments is null
    Given an empty graph
    When executing query:
      """
      RETURN replace('abc', null, 'y') AS a, replace('abc', 'b', null) AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |

  Scenario: split on a single character
    Given an empty graph
    When executing query:
      """
      RETURN split('a,b,c', ',') AS r
      """
    Then the result should be, in any order:
      | r               |
      | ['a', 'b', 'c'] |

  Scenario: split with separator absent yields the whole string
    Given an empty graph
    When executing query:
      """
      RETURN split('abc', ',') AS r
      """
    Then the result should be, in any order:
      | r       |
      | ['abc'] |

  Scenario: split keeps empty leading and trailing fields
    Given an empty graph
    When executing query:
      """
      RETURN split(',a,', ',') AS r
      """
    Then the result should be, in any order:
      | r             |
      | ['', 'a', ''] |

  Scenario: split on a regex metacharacter is literal
    Given an empty graph
    When executing query:
      """
      RETURN split('a.b.c', '.') AS r
      """
    Then the result should be, in any order:
      | r               |
      | ['a', 'b', 'c'] |

  Scenario: reverse a string
    Given an empty graph
    When executing query:
      """
      RETURN reverse('abc') AS r, reverse('') AS e
      """
    Then the result should be, in any order:
      | r     | e  |
      | 'cba' | '' |

  Scenario: toUpper and toLower round trip
    Given an empty graph
    When executing query:
      """
      RETURN toUpper('MiXeD') AS u, toLower('MiXeD') AS l
      """
    Then the result should be, in any order:
      | u       | l       |
      | 'MIXED' | 'mixed' |

  Scenario: toString of numbers keeps integer and float flavor
    Given an empty graph
    When executing query:
      """
      RETURN toString(42) AS i, toString(2.5) AS f, toString(true) AS b
      """
    Then the result should be, in any order:
      | i    | f     | b      |
      | '42' | '2.5' | 'true' |

  Scenario: size of strings counts characters
    Given an empty graph
    When executing query:
      """
      RETURN size('hello') AS n, size('') AS z
      """
    Then the result should be, in any order:
      | n | z |
      | 5 | 0 |

  Scenario: string concatenation chains with numbers through toString
    Given an empty graph
    When executing query:
      """
      RETURN 'v=' + toString(1 + 2) AS r
      """
    Then the result should be, in any order:
      | r     |
      | 'v=3' |

  Scenario: STARTS WITH and ENDS WITH on computed strings
    Given an empty graph
    When executing query:
      """
      WITH 'hello world' AS s
      RETURN s STARTS WITH 'hello' AS a, s ENDS WITH 'world' AS b,
             s STARTS WITH 'world' AS c
      """
    Then the result should be, in any order:
      | a    | b    | c     |
      | true | true | false |

  Scenario: CONTAINS with empty string is always true
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' CONTAINS '' AS a, '' CONTAINS '' AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: string predicates with null operand are null
    Given an empty graph
    When executing query:
      """
      WITH null AS s
      RETURN s CONTAINS 'a' IS NULL AS a, 'abc' STARTS WITH s IS NULL AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: regex full match only
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' =~ 'a.c' AS full, 'abcd' =~ 'a.c' AS partial
      """
    Then the result should be, in any order:
      | full | partial |
      | true | false   |

  Scenario: regex with character class and quantifier
    Given an empty graph
    When executing query:
      """
      RETURN 'a123' =~ '[a-z][0-9]+' AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |

  Scenario: composed string pipeline
    Given an empty graph
    When executing query:
      """
      RETURN toUpper(substring(replace('a-b-c', '-', '_'), 2)) AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'B_C'  |

  Scenario: split then size then index
    Given an empty graph
    When executing query:
      """
      WITH split('x|y|z', '|') AS parts
      RETURN size(parts) AS n, parts[1] AS mid, parts[-1] AS last
      """
    Then the result should be, in any order:
      | n | mid | last |
      | 3 | 'y' | 'z'  |

  Scenario: string functions over node properties with nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:S {v: 'Hello'}), (:S)
      """
    When executing query:
      """
      MATCH (s:S)
      RETURN toLower(s.v) AS lo ORDER BY lo
      """
    Then the result should be, in order:
      | lo      |
      | 'hello' |
      | null    |

  Scenario: toString of temporal values round trips
    Given an empty graph
    When executing query:
      """
      RETURN toString(date('2024-03-15')) AS d,
             toString(localdatetime('2024-03-15T10:30:00')) AS t
      """
    Then the result should be, in any order:
      | d            | t                     |
      | '2024-03-15' | '2024-03-15T10:30:00' |
