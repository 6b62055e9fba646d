Feature: WHERE null-filtering matrix (unknown rows are dropped)

  Scenario: comparison against a missing property drops the row
    Given an empty graph
    And having executed:
      """
      CREATE (:WF {id: 1, v: 5}), (:WF {id: 2})
      """
    When executing query:
      """
      MATCH (w:WF) WHERE w.v > 0 RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: negated comparison still drops unknown rows
    Given an empty graph
    And having executed:
      """
      CREATE (:WF {id: 1, v: 5}), (:WF {id: 2})
      """
    When executing query:
      """
      MATCH (w:WF) WHERE NOT w.v > 10 RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: IS NULL rescues the unknown rows explicitly
    Given an empty graph
    And having executed:
      """
      CREATE (:WF {id: 1, v: 5}), (:WF {id: 2})
      """
    When executing query:
      """
      MATCH (w:WF) WHERE w.v > 10 OR w.v IS NULL RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: null-involved AND can still be decidedly false
    Given an empty graph
    And having executed:
      """
      CREATE (:WA {id: 1}), (:WA {id: 2, ok: true})
      """
    When executing query:
      """
      MATCH (w:WA) WHERE w.ok AND false RETURN count(w) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: null-involved OR can still be decidedly true
    Given an empty graph
    And having executed:
      """
      CREATE (:WO {id: 1}), (:WO {id: 2, ok: true})
      """
    When executing query:
      """
      MATCH (w:WO) WHERE w.ok OR true RETURN count(w) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: IN over a column with missing values
    Given an empty graph
    And having executed:
      """
      CREATE (:WI {id: 1, tag: 'a'}), (:WI {id: 2}), (:WI {id: 3, tag: 'z'})
      """
    When executing query:
      """
      MATCH (w:WI) WHERE w.tag IN ['a', 'b'] RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: CONTAINS over missing strings drops rows
    Given an empty graph
    And having executed:
      """
      CREATE (:WC {id: 1, s: 'hello'}), (:WC {id: 2})
      """
    When executing query:
      """
      MATCH (w:WC) WHERE w.s CONTAINS 'ell' RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: equality with null literal never matches
    Given an empty graph
    And having executed:
      """
      CREATE (:WE {id: 1}), (:WE {id: 2, v: 3})
      """
    When executing query:
      """
      MATCH (w:WE) WHERE w.v = null RETURN count(w) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: inequality with null literal never matches either
    Given an empty graph
    And having executed:
      """
      CREATE (:WNE {id: 1, v: 3})
      """
    When executing query:
      """
      MATCH (w:WNE) WHERE w.v <> null RETURN count(w) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: coalesce in WHERE supplies defaults
    Given an empty graph
    And having executed:
      """
      CREATE (:WD {id: 1, v: 9}), (:WD {id: 2})
      """
    When executing query:
      """
      MATCH (w:WD) WHERE coalesce(w.v, 0) < 5 RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: range membership with null bound is unknown
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      WITH x, null AS lo
      WHERE x > lo
      RETURN count(x) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: STARTS WITH on null subject filters out
    Given an empty graph
    When executing query:
      """
      UNWIND ['abc', null, 'abd'] AS s
      WITH s WHERE s STARTS WITH 'ab'
      RETURN count(s) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: XOR with one null operand filters
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, null] AS b
      WITH b WHERE b XOR false
      RETURN count(b) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: quantifier result used directly in WHERE
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [1, null], [3]] AS l
      WITH l WHERE all(x IN l WHERE x < 3)
      RETURN count(l) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: boolean column compared to literal true
    Given an empty graph
    And having executed:
      """
      CREATE (:WB {id: 1, on: true}), (:WB {id: 2, on: false}), (:WB {id: 3})
      """
    When executing query:
      """
      MATCH (w:WB) WHERE w.on = true RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: arithmetic involving missing property is unknown
    Given an empty graph
    And having executed:
      """
      CREATE (:WM {id: 1, a: 2, b: 3}), (:WM {id: 2, a: 2})
      """
    When executing query:
      """
      MATCH (w:WM) WHERE w.a + w.b > 4 RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: IS NOT NULL conjunction guards arithmetic
    Given an empty graph
    And having executed:
      """
      CREATE (:WG {id: 1, v: 4}), (:WG {id: 2})
      """
    When executing query:
      """
      MATCH (w:WG) WHERE w.v IS NOT NULL AND w.v * 2 > 5
      RETURN w.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: nested boolean with null resolves by absorption
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, null] AS b
      WITH b WHERE (b OR true) AND (b IS NULL OR b = b)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |

  Scenario: size of null list in WHERE filters
    Given an empty graph
    When executing query:
      """
      UNWIND [[1], null, [2, 3]] AS l
      WITH l WHERE size(l) > 1
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: ends with on computed null concatenation
    Given an empty graph
    When executing query:
      """
      UNWIND ['x', null] AS s
      WITH s WHERE (s + '!') ENDS WITH '!'
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: IN against a null element list can be true
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x
      WITH x WHERE x IN [1, null]
      RETURN collect(x) AS xs
      """
    Then the result should be, in any order:
      | xs  |
      | [1] |

  Scenario: double negation of null is still filtered
    Given an empty graph
    When executing query:
      """
      UNWIND [true, null] AS b
      WITH b WHERE NOT (NOT b)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: comparison chain with a null middle term
    Given an empty graph
    When executing query:
      """
      WITH null AS m
      UNWIND [1, 2] AS x
      WITH x, m WHERE 0 < m < x
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: label predicate on preserved row with null entity is filtered
    Given an empty graph
    And having executed:
      """
      CREATE (:WL {id: 1})
      """
    When executing query:
      """
      MATCH (w:WL)
      OPTIONAL MATCH (w)-[:R]->(m)
      WITH w, m WHERE m:Anything
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |

  Scenario: null-safe existence idiom with exists-style check
    Given an empty graph
    And having executed:
      """
      CREATE (:WS {id: 1, opt: 'x'}), (:WS {id: 2})
      """
    When executing query:
      """
      MATCH (w:WS)
      RETURN w.id AS id, w.opt IS NOT NULL AS has ORDER BY id
      """
    Then the result should be, in order:
      | id | has   |
      | 1  | true  |
      | 2  | false |

  Scenario: filtering on a coalesced boolean keeps decided rows
    Given an empty graph
    When executing query:
      """
      UNWIND [true, false, null] AS b
      WITH b WHERE coalesce(b, false)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
