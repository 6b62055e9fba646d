Feature: Untyped and unlabeled write targets — writes reach every node table

  # Round-7 regression matrix for three silently-wrong corners found by
  # direct probing: an untyped MATCH (n) bound variable spans every label
  # table INCLUDING the "" sentinel for unlabeled nodes, and an unlabeled
  # CREATE binding lives in the sentinel — SET/REMOVE/SET:Label on either
  # must reach the store (previously the unlabeled rows were skipped).

  Scenario: untyped SET reaches unlabeled nodes
    Given an empty graph
    And having executed:
      """
      CREATE ({k: 1}), (:A {k: 2}), (:B {k: 3})
      """
    And having executed:
      """
      MATCH (n) SET n.x = n.k * 10
      """
    When executing query:
      """
      MATCH (n) RETURN n.k AS k, n.x AS x
      """
    Then the result should be, in any order:
      | k | x  |
      | 1 | 10 |
      | 2 | 20 |
      | 3 | 30 |

  Scenario: untyped SET label tags every node including unlabeled
    Given an empty graph
    And having executed:
      """
      CREATE ({k: 1}), (:A {k: 2}), (:B {k: 3})
      """
    And having executed:
      """
      MATCH (n) SET n:Tagged
      """
    When executing query:
      """
      MATCH (n:Tagged) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
      | 2 |
      | 3 |

  Scenario: untyped REMOVE reaches unlabeled nodes
    Given an empty graph
    And having executed:
      """
      CREATE ({k: 1, junk: true}), (:A {k: 2, junk: true})
      """
    And having executed:
      """
      MATCH (n) REMOVE n.junk
      """
    When executing query:
      """
      MATCH (n) WHERE n.junk IS NULL RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: SET on an unlabeled CREATE binding persists
    Given an empty graph
    And having executed:
      """
      CREATE (n {k: 1}) SET n.x = 5
      """
    When executing query:
      """
      MATCH (n) RETURN n.k AS k, n.x AS x
      """
    Then the result should be, in any order:
      | k | x |
      | 1 | 5 |

  Scenario: SET label on an unlabeled CREATE binding persists
    Given an empty graph
    And having executed:
      """
      CREATE (n {k: 2}) SET n:Up
      """
    When executing query:
      """
      MATCH (n:Up) RETURN n.k AS k, labels(n) AS l
      """
    Then the result should be, in any order:
      | k | l      |
      | 2 | ['Up'] |

  Scenario: late label on a previously unlabeled node is matchable
    Given an empty graph
    And having executed:
      """
      CREATE ({k: 1}), (:A {k: 2})
      """
    And having executed:
      """
      MATCH (n) WHERE n.k = 1 SET n:Late
      """
    When executing query:
      """
      MATCH (n:Late) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: untyped DETACH DELETE removes unlabeled nodes
    Given an empty graph
    And having executed:
      """
      CREATE ({k: 1}), (:A {k: 2})
      """
    And having executed:
      """
      MATCH (n) WHERE n.k = 1 DETACH DELETE n
      """
    When executing query:
      """
      MATCH (n) RETURN n.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |

  Scenario: untyped SET += map reaches unlabeled nodes
    Given an empty graph
    And having executed:
      """
      CREATE ({k: 1}), (:A {k: 2})
      """
    And having executed:
      """
      MATCH (n) SET n += {seen: true}
      """
    When executing query:
      """
      MATCH (n) WHERE n.seen RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
