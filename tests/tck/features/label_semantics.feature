Feature: Label semantics corners (multi-label matching, label predicates in
  expressions, label mutation visibility)

  Scenario: Created multi-label node matches each label scan
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {v: 1})
      """
    When executing query:
      """
      MATCH (a:A) MATCH (b:B) RETURN a.v AS av, b.v AS bv
      """
    Then the result should be, in any order:
      | av | bv |
      | 1  | 1  |

  Scenario: Label removal hides the node from that label scan
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {v: 1})
      """
    And having executed:
      """
      MATCH (n:B) REMOVE n:B
      """
    When executing query:
      """
      MATCH (n:B) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Label removal keeps the other labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A:B {v: 1})
      """
    And having executed:
      """
      MATCH (n:B) REMOVE n:B
      """
    When executing query:
      """
      MATCH (n:A) RETURN labels(n) AS ls
      """
    Then the result should be, in any order:
      | ls    |
      | ['A'] |

  Scenario: SET multiple labels at once
    Given an empty graph
    And having executed:
      """
      CREATE (:N {id: 1})
      """
    And having executed:
      """
      MATCH (n:N) SET n:X:Y
      """
    When executing query:
      """
      MATCH (n:N) RETURN labels(n) AS ls
      """
    Then the result should be, in any order:
      | ls              |
      | ['N', 'X', 'Y'] |

  Scenario: Label predicate on an optional-match variable is null-safe
    Given an empty graph
    And having executed:
      """
      CREATE (:A {id: 1})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.id AS id, b IS NULL AS nob
      """
    Then the result should be, in any order:
      | id | nob  |
      | 1  | true |

  Scenario: Unknown label scan returns empty not error
    Given an empty graph
    And having executed:
      """
      CREATE (:Known {v: 1})
      """
    When executing query:
      """
      MATCH (n:NeverCreated) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |

  Scenario: Untyped scan sees every label once per node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2}), (:A:B {v: 3})
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS nodes, sum(n.v) AS total
      """
    Then the result should be, in any order:
      | nodes | total |
      | 3     | 6     |

  Scenario: Label predicate filters an untyped scan
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:B {v: 2}), (:A:B {v: 3})
      """
    When executing query:
      """
      MATCH (n) WHERE n:A RETURN sum(n.v) AS total
      """
    Then the result should be, in any order:
      | total |
      | 4     |

  Scenario: Conjunction label predicate needs all labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A:B {v: 3})
      """
    When executing query:
      """
      MATCH (n:A) WHERE n:A:B RETURN sum(n.v) AS total
      """
    Then the result should be, in any order:
      | total |
      | 3     |

  Scenario: CREATE with three labels
    Given an empty graph
    And having executed:
      """
      CREATE (:X:Y:Z {id: 1})
      """
    When executing query:
      """
      MATCH (n:Y) RETURN labels(n) AS ls
      """
    Then the result should be, in any order:
      | ls              |
      | ['X', 'Y', 'Z'] |
