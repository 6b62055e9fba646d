Feature: Quantifier three-valued truth tables (reference Quantifier1-12)

  The predicate x > 0 maps elements to true (1), false (0 via -1), and
  unknown (null) — covering each quantifier's decision table.

  Scenario: all quantifier truth table
    Given an empty graph
    When executing query:
      """
      RETURN all(x IN [1, 2] WHERE x > 0) AS tt,
             all(x IN [1, -1] WHERE x > 0) AS tf,
             all(x IN [1, null] WHERE x > 0) AS tn,
             all(x IN [-1, null] WHERE x > 0) AS fn,
             all(x IN [null] WHERE x > 0) AS n
      """
    Then the result should be, in any order:
      | tt   | tf    | tn   | fn    | n    |
      | true | false | null | false | null |

  Scenario: any quantifier truth table
    Given an empty graph
    When executing query:
      """
      RETURN any(x IN [1, -1] WHERE x > 0) AS tf,
             any(x IN [-1, -2] WHERE x > 0) AS ff,
             any(x IN [-1, null] WHERE x > 0) AS fn,
             any(x IN [1, null] WHERE x > 0) AS tn,
             any(x IN [null] WHERE x > 0) AS n
      """
    Then the result should be, in any order:
      | tf   | ff    | fn   | tn   | n    |
      | true | false | null | true | null |

  Scenario: none quantifier truth table
    Given an empty graph
    When executing query:
      """
      RETURN none(x IN [-1, -2] WHERE x > 0) AS ff,
             none(x IN [1, -1] WHERE x > 0) AS tf,
             none(x IN [-1, null] WHERE x > 0) AS fn,
             none(x IN [1, null] WHERE x > 0) AS tn
      """
    Then the result should be, in any order:
      | ff   | tf    | fn   | tn    |
      | true | false | null | false |

  Scenario: single quantifier truth table
    Given an empty graph
    When executing query:
      """
      RETURN single(x IN [1, -1] WHERE x > 0) AS one,
             single(x IN [1, 2] WHERE x > 0) AS two,
             single(x IN [-1, -2] WHERE x > 0) AS zero,
             single(x IN [1, null] WHERE x > 0) AS tn,
             single(x IN [1, 2, null] WHERE x > 0) AS ttn,
             single(x IN [-1, null] WHERE x > 0) AS fn
      """
    Then the result should be, in any order:
      | one  | two   | zero  | tn   | ttn   | fn   |
      | true | false | false | null | false | null |

  Scenario: Quantifiers over the empty list
    Given an empty graph
    When executing query:
      """
      RETURN all(x IN [] WHERE x > 0) AS a,
             any(x IN [] WHERE x > 0) AS b,
             none(x IN [] WHERE x > 0) AS c,
             single(x IN [] WHERE x > 0) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d     |
      | true | false | true | false |

  Scenario: Quantifiers over a null list
    Given an empty graph
    When executing query:
      """
      WITH null AS l
      RETURN all(x IN l WHERE x > 0) AS a,
             any(x IN l WHERE x > 0) AS b,
             none(x IN l WHERE x > 0) AS c,
             single(x IN l WHERE x > 0) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |

  Scenario: Quantifier in WHERE filters rows three-valued
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1, null], [-1, -2]] AS l
      WITH l WHERE all(x IN l WHERE x > 0)
      RETURN count(*) AS kept
      """
    Then the result should be, in any order:
      | kept |
      | 1    |

  Scenario: Quantifier over string predicates
    Given an empty graph
    When executing query:
      """
      RETURN any(s IN ['apple', 'banana'] WHERE s STARTS WITH 'b') AS hit,
             none(s IN ['apple', 'banana'] WHERE s CONTAINS 'z') AS clean
      """
    Then the result should be, in any order:
      | hit  | clean |
      | true | true  |

  Scenario: Nested quantifier over lists of lists
    Given an empty graph
    When executing query:
      """
      RETURN all(l IN [[1], [1, 2]] WHERE any(x IN l WHERE x = 1)) AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |

  Scenario: Quantifier predicate referencing an outer variable
    Given an empty graph
    When executing query:
      """
      WITH 2 AS limit
      RETURN all(x IN [1, 2] WHERE x <= limit) AS within
      """
    Then the result should be, in any order:
      | within |
      | true   |

  Scenario: Quantifier interop with range and comprehension
    Given an empty graph
    When executing query:
      """
      RETURN single(x IN [y IN range(1, 10) WHERE y % 5 = 0 | y] WHERE x = 5) AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |

  Scenario: De Morgan duality between all and none
    Given an empty graph
    When executing query:
      """
      WITH [1, -1, 2] AS l
      RETURN none(x IN l WHERE x < 0) = all(x IN l WHERE NOT x < 0) AS dual
      """
    Then the result should be, in any order:
      | dual |
      | true |
