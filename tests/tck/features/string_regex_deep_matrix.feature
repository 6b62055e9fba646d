Feature: Regex deep matrix (anchoring, classes, escapes, null)

  Scenario: full anchoring rejects partial matches both ways
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' =~ 'b' AS mid, 'abc' =~ 'abc' AS full,
             'abc' =~ '.*b.*' AS wrapped
      """
    Then the result should be, in any order:
      | mid   | full | wrapped |
      | false | true | true    |

  Scenario: case-insensitive flag prefix
    Given an empty graph
    When executing query:
      """
      RETURN 'ABC' =~ '(?i)abc' AS ok, 'ABC' =~ 'abc' AS strict
      """
    Then the result should be, in any order:
      | ok   | strict |
      | true | false  |

  Scenario: alternation groups
    Given an empty graph
    When executing query:
      """
      UNWIND ['cat', 'dog', 'cow'] AS w
      WITH w WHERE w =~ 'cat|dog'
      RETURN w ORDER BY w
      """
    Then the result should be, in order:
      | w     |
      | 'cat' |
      | 'dog' |

  Scenario: escaped dot matches literally
    Given an empty graph
    When executing query:
      """
      RETURN 'a.b' =~ 'a\\.b' AS lit, 'axb' =~ 'a\\.b' AS notdot
      """
    Then the result should be, in any order:
      | lit  | notdot |
      | true | false  |

  Scenario: quantifiers star plus question
    Given an empty graph
    When executing query:
      """
      RETURN 'aaa' =~ 'a*' AS star, '' =~ 'a*' AS empty_star,
             '' =~ 'a+' AS empty_plus, 'ab' =~ 'ab?' AS opt
      """
    Then the result should be, in any order:
      | star | empty_star | empty_plus | opt  |
      | true | true       | false      | true |

  Scenario: bounded repetition
    Given an empty graph
    When executing query:
      """
      RETURN '1234' =~ '[0-9]{4}' AS four, '123' =~ '[0-9]{4}' AS three
      """
    Then the result should be, in any order:
      | four | three |
      | true | false |

  Scenario: null subject or pattern yields null
    Given an empty graph
    When executing query:
      """
      WITH null AS n
      RETURN (n =~ 'a') IS NULL AS subj, ('a' =~ n) IS NULL AS pat
      """
    Then the result should be, in any order:
      | subj | pat  |
      | true | true |

  Scenario: regex over a property column filters rows
    Given an empty graph
    And having executed:
      """
      CREATE (:RX {code: 'AB-12'}), (:RX {code: 'XY-99'}), (:RX {code: 'AB9'})
      """
    When executing query:
      """
      MATCH (r:RX) WHERE r.code =~ 'AB-[0-9]+'
      RETURN r.code AS code
      """
    Then the result should be, in any order:
      | code    |
      | 'AB-12' |

  Scenario: regex built from concatenation
    Given an empty graph
    When executing query:
      """
      WITH 'ab' AS prefix
      RETURN 'abc' =~ (prefix + '.') AS r
      """
    Then the result should be, in any order:
      | r    |
      | true |

  Scenario: word characters versus whitespace classes
    Given an empty graph
    When executing query:
      """
      RETURN 'a b' =~ '\\w\\s\\w' AS ok, 'ab' =~ '\\w\\s\\w' AS no
      """
    Then the result should be, in any order:
      | ok   | no    |
      | true | false |
